"""HTTP synthesis server example — see xtts_tpu.infer.http for the
implementation (JSON in, WAV out, cross-request sentence microbatching).

  python examples/serve_http.py --ref-wav ref.wav --port 8080
is equivalent to the installed `xtts-tpu-serve` entry point.
"""
from xtts_tpu.infer.http import main

if __name__ == "__main__":
    main()
