"""Raw HBM->VMEM DMA bandwidth probe (Pallas, real TPU).

Measures sustained single- and multi-stream DMA bandwidth for the dtypes the
fused decode kernel streams (int8 weight tiles, bf16 cache, int32 bitcast of
the int8 stack). Each config copies the SAME total bytes (~189 MB, the GPT
int8 weight stream) chunk-by-chunk through a VMEM ring; N outer reps run
inside one jitted lax.scan so tunnel RTT and launch cost amortize. A scalar
reduction of the last chunk keeps the pipeline live.

Run alone (holds the TPU): python scripts/probe_dma_bw.py
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_xtts"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = int(os.environ.get("PROBE_REPS", 30))


def make_stream_kernel(n_chunks: int, ring: int):
    """Copy hbm_ref (n_chunks, C, 128) -> ring buffer, double-buffered."""

    def kernel(hbm_ref, out_ref, buf, sem):
        def dma(i):
            return pltpu.make_async_copy(hbm_ref.at[i], buf.at[i % ring],
                                         sem.at[i % ring])

        for i in range(min(ring - 1, n_chunks)):
            dma(i).start()

        def body(i, acc):
            @pl.when(i + ring - 1 < n_chunks)
            def _():
                dma(i + ring - 1).start()
            dma(i).wait()
            # touch one vector of the chunk so the copy isn't dead
            return acc + buf[i % ring, 0, :].astype(jnp.float32)

        acc = jax.lax.fori_loop(
            0, n_chunks, body, jnp.zeros((128,), jnp.float32))
        out_ref[0, :] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("n_chunks", "ring", "reps"))
def run_stream(arr, n_chunks, ring, reps):
    c = arr.shape[1]
    kern = make_stream_kernel(n_chunks, ring)

    def step(carry, _):
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((ring, c, 128), arr.dtype),
                    pltpu.SemaphoreType.DMA((ring,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        )(arr)
        return carry + out[0, 0], None

    acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=reps)
    return acc


def timed(fn, *args):
    float(fn(*args))  # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    total_mb = 189
    print(f"devices: {jax.devices()}  reps={REPS} total={total_mb} MB/rep")
    rng = np.random.default_rng(0)
    for dtype, bytes_per in (("int8", 1), ("bfloat16", 2), ("int32", 4)):
        for chunk_mb in (1, 2, 4):
            for ring in (2, 4, 8):
                n_chunks = total_mb // chunk_mb
                elems = chunk_mb * (1 << 20) // bytes_per
                c = elems // 128
                if ring * chunk_mb > 10:  # VMEM guard
                    continue
                arr = jnp.asarray(
                    rng.integers(-100, 100, (n_chunks, c, 128)),
                    dtype=jnp.dtype(dtype))
                t = timed(run_stream, arr, n_chunks, ring, REPS) / REPS
                bw = total_mb * 1e-3 / t  # GB/s (decimal-ish, MB=2^20)
                print(f"{dtype:9s} chunk={chunk_mb}MB ring={ring}: "
                      f"{t*1e3:7.3f} ms -> {bw*1.048576:6.1f} GB/s",
                      flush=True)


if __name__ == "__main__":
    main()
