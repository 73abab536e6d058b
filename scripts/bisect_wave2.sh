#!/bin/bash
# Shell driver for bisect probes: a PYTHON parent process self-deadlocks
# (the axon sitecustomize in the parent claims the chip; every child then
# blocks at first device op until the probe timeout — indistinguishable
# from a compile hang; round-5 postmortem in PERF.md). Bash holds no chip.
T=${BISECT_TIMEOUT:-900}
for kind in "$@"; do
  echo "=== $kind $(date -u +%H:%M:%S) ==="
  timeout "$T" env BISECT_SPEC="{\"name\":\"$kind\",\"kind\":\"$kind\",\"bs\":16}" \
    python scripts/bisect_gpt_compile.py one 2>&1 | grep --line-buffered -vE "WARNING|Building prefix|Prefix dict|Loading model|Dumping model|cost [0-9]"
  # PIPESTATUS[0]: the python/timeout rc, NOT grep's (rc=124 = hang).
  # grad probe 2026-08-20 22:48 was misread as rc=0 from grep's status.
  echo "rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)"
done
