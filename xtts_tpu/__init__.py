"""xtts_tpu — a TPU-native Mandarin zero-shot TTS framework.

A from-scratch JAX/XLA/Pallas re-design of the tortoise/XTTS-style TTS stack
(reference: boostpapa/xtts "TTTS"): mel front-end, DVAE mel quantizer, GPT
autoregressive mel-code decoder, ReferenceNet-conditioned UNet1D diffusion
decoder, Vocos vocoder, CLVP reranker — all built TPU-first:

* compute path: jit-compiled XLA + Pallas kernels (VQ codebook lookup,
  flash KV-cache decoding), bf16 on the MXU
* parallelism: ``jax.sharding.Mesh`` + NamedSharding/shard_map, collectives
  over ICI (psum for data-parallel grads and VQ EMA stats)
* control flow: ``lax.scan``/``lax.while_loop`` sampling loops, static shapes
  with bucketed padding

Package layout
    core/      config, prng, checkpointing, logging
    dsp/       STFT / mel filterbank / iSTFT as framed matmuls
    nn/        shared flax modules (attention blocks, convs, norms, perceiver)
    ops/       Pallas TPU kernels with XLA fallbacks
    models/    dvae, gpt, aa_diffusion, vocos, clvp, classifier, hifigan
    diffusion/ Gaussian diffusion process + scan-based samplers
    text/      Mandarin text frontend (TN, G2P, tone sandhi) + BPE tokenizer
    train/     pjit data-parallel trainers
    infer/     TextToSpeech end-to-end API
    data/      datasets, bucketing collaters, prepare pipeline
    parallel/  mesh + sharding rules
"""

__version__ = "0.1.0"
