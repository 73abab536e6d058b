"""Bisect WHICH axis of the frozen-GPT latent program breaks the remote
compile transport (PERF.md phase 13/15).

Evidence so far: every program containing the teacher-forced GPT forward
at batch>=2 hangs the remote compile (>26 min -> Broken pipe), while the
SAME architecture compiles fine as (a) jit init at tiny shapes, (b) B=1
AR prefill/decode, (c) the bf16 fwd+bwd train step at bs8 (3 min,
2026-08-19 13:41). This script probes one (layers, bs, text, mel,
dtype, cond) point per SUBPROCESS with a hard timeout, so a hang costs
TIMEOUT_S instead of 26 min, and prints a verdict table.

Run:  python scripts/bisect_gpt_compile.py            # the probe matrix
      BISECT_PROBE=layers=2,bs=16 python scripts/bisect_gpt_compile.py one
Env:  BISECT_TIMEOUT (s per probe, default 420).
"""
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_xtts"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TIMEOUT = int(os.environ.get("BISECT_TIMEOUT", 420))

# each probe: overrides on (layers, bs, text, mel, dtype)
PROBES = [
    # batch axis (bs2 hifigan-split already hung in r4; bs1 is the open one)
    {"name": "bs1", "bs": 1},
    {"name": "bs2", "bs": 2},
    # depth axis at the hanging batch
    {"name": "L2_bs16", "layers": 2, "bs": 16},
    {"name": "L8_bs16", "layers": 8, "bs": 16},
    # sequence axis
    {"name": "shortseq_bs16", "bs": 16, "text": 32, "mel": 64},
    # dtype axis
    {"name": "bf16_bs16", "bs": 16, "dtype": "bfloat16"},
    # the known hang, as the control (costs TIMEOUT_S)
    {"name": "full_bs16", "bs": 16},
    # non-GPT control at similar scale: diffusion UNet denoise fwd at
    # bs16 — discriminates "GPT-program-specific" vs "service degraded
    # for all mid-size programs right now"
    {"name": "unet_bs16", "kind": "unet", "bs": 16},
]

# Round-5 second wave: scan-over-layers ALSO hung (~25 min pipe,
# measurements_r5/diag_scan_latent.log) -> size/unroll is not the axis.
# The same forward compiles inside value_and_grad (GPT train step, 3 min,
# phase 11). These discriminate WHICH part of the fwd-only program the
# service's compiler spins on.
PROBES2 = [
    # halves of the program, each alone
    {"name": "cond_only", "kind": "cond", "bs": 16},
    {"name": "stack_only", "kind": "stack", "bs": 16},
    # output-materialization axes: scalar output / untransposed output
    {"name": "latent_sum", "kind": "latent_sum", "bs": 16},
    {"name": "latent_notrans", "kind": "latent_notrans", "bs": 16},
    # the fwd+bwd formulation that is KNOWN to compile as a train step:
    # value_and_grad over params with the latent as aux — if this
    # compiles, it is a (2-3x FLOP) fallback engine for latent extraction
    {"name": "latent_grad", "kind": "grad", "bs": 16},
    # grad with a RUNTIME cotangent: the 'grad' probe's sum(lat)*0.0 loss
    # seeds the backward with a CONSTANT zero the compiler can fold away,
    # collapsing the program back to the fwd-only shape (it hung 900s+ on
    # 2026-08-20 22:33). vdot(lat, probe) with probe a runtime input makes
    # the backward unfoldable — the true fwd+bwd train-step shape.
    {"name": "latent_grad_rt", "kind": "grad_rt", "bs": 16},
    # THE DECISIVE ONE (post stack-probe HTTP 413, 2026-08-20 22:55): the
    # same fwd-only latent program with the 933 MB of GPT params passed as
    # jit ARGUMENTS instead of closure constants. Closure params embed in
    # the serialized HLO: the remote-compile POST either trips the
    # service's body-size limit (413) or uploads at ~600 KB/s for ~25 min
    # until the pipe breaks — the entire phase-13 "compile hang". Every
    # program that ever compiled fine passes params as args.
    {"name": "latent_args", "kind": "latent_args", "bs": 16},
    # service control
    {"name": "unet_ctl", "kind": "unet", "bs": 16},
]


def run_one():
    """Subprocess body: build ONE gpt-latent program and compile it."""
    spec = json.loads(os.environ["BISECT_SPEC"])
    import jax
    import jax.numpy as jnp
    import numpy as np
    from xtts_tpu.core.config import XTTSConfig
    from xtts_tpu.utils.registry import load_model

    cfg = XTTSConfig()
    if "layers" in spec:
        cfg = cfg.replace(gpt=cfg.gpt.replace(layers=spec["layers"]))
    dt = jnp.bfloat16 if spec.get("dtype") == "bfloat16" else jnp.float32
    bs, tlen, dlen = spec.get("bs", 16), spec.get("text", 150), \
        spec.get("mel", 400)

    if spec.get("kind") == "unet":
        from xtts_tpu.models.aa_diffusion import AADiffusion
        model = AADiffusion(cfg.diffusion, dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(
            (bs, cfg.diffusion.in_channels, dlen)).astype(np.float32))
        hint = jnp.asarray(rng.standard_normal(
            (bs, cfg.diffusion.in_latent_channels, dlen)).astype(np.float32))
        refer = jnp.asarray(rng.standard_normal(
            (bs, cfg.diffusion.in_channels, 304)).astype(np.float32))
        t = jnp.zeros((bs,), jnp.int32)
        t0 = time.time()
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, hint,
                                        refer)
        float(np.asarray(
            jax.tree_util.tree_leaves(variables)[0]).ravel()[0])
        print(f"init done {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        lowered = jax.jit(lambda v, xx: model.apply(v, xx, t, hint, refer)
                          ).lower(variables, x)
        print(f"lowered {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        compiled = lowered.compile()
        print(f"compiled {time.time()-t0:.1f}s", flush=True)
        out = compiled(variables, x)
        print(f"sum={float(np.asarray(out).sum()):.3e}", flush=True)
        return

    t0 = time.time()
    gpt, gv = load_model("gpt", cfg, dtype=dt)
    # fence: the jit init dispatch is async — force a host fetch so the
    # init COMPILE (remote) is not misattributed to the next phase
    # (block_until_ready can return early on this tunnel; fetch a value)
    float(np.asarray(jax.tree_util.tree_leaves(gv)[0]).ravel()[0])
    print(f"init done (incl. remote init compile) {time.time()-t0:.1f}s",
          flush=True)

    rng = np.random.default_rng(0)
    refer = jnp.asarray(rng.standard_normal(
        (bs, cfg.mel.n_mels, 304)).astype(np.float32) * 0.1)
    text = jnp.asarray(rng.integers(3, 250, (bs, tlen)).astype(np.int32))
    text_lens = jnp.full((bs,), tlen, jnp.int32)
    wav_lens = jnp.full((bs,), dlen * cfg.mel.hop_length, jnp.int32)
    codes = jnp.asarray(rng.integers(0, 8192, (bs, dlen // 4)).astype(np.int32))

    kind = spec.get("kind", "latent")
    if kind == "cond":
        def probe_fn(r_):
            return gpt.apply(gv, r_, method=gpt.get_conditioning)
        probe_args = (refer,)
    elif kind == "stack":
        # the 15-layer stack alone on a latent-program-shaped embedding
        # sequence (1 cond + 151 text + 102 mel), full (B,T,D) output
        seq = 1 + (tlen + 2) + (dlen // 4 + 2)
        emb = jnp.asarray(rng.standard_normal(
            (bs, seq, cfg.gpt.model_dim)).astype(np.float32) * 0.02)

        def probe_fn(e_):
            _, normed = gpt.apply(gv, e_, method=lambda m, x: m.gpt(x))
            return normed
        probe_args = (emb,)
    elif kind == "latent_sum":
        def probe_fn(codes_):
            lat = gpt.apply(gv, refer, text, text_lens, codes_, wav_lens,
                            return_latent=True)
            return jnp.sum(lat.astype(jnp.float32))
        probe_args = (codes,)
    elif kind == "latent_notrans":
        def probe_fn(codes_):
            return gpt.apply(gv, refer, text, text_lens, codes_, wav_lens,
                             return_latent=True)
        probe_args = (codes,)
    elif kind == "grad":
        def loss_of(params, codes_):
            lat = gpt.apply({**gv, "params": params}, refer, text,
                            text_lens, codes_, wav_lens, return_latent=True)
            return jnp.sum(lat.astype(jnp.float32)) * 0.0, lat

        def probe_fn(codes_):
            (_, lat), _ = jax.value_and_grad(loss_of, has_aux=True)(
                gv["params"], codes_)
            return jnp.swapaxes(lat, 1, 2)
        probe_args = (codes,)
    elif kind == "grad_rt":
        # runtime cotangent + grad-norm OUTPUT: the 22:33 'grad' probe
        # discarded the grads, so JAX/XLA dead-code-eliminated the whole
        # backward and compiled exactly the fwd-only (hanging) program.
        # Seeding the backward with a runtime zeros array AND returning a
        # reduction of the grads keeps the fwd+bwd (train-step) shape alive
        # (matches xtts_tpu/train/steps.py gpt_latent).
        def loss_of_rt(params, codes_, probe_):
            lat = gpt.apply({**gv, "params": params}, refer, text,
                            text_lens, codes_, wav_lens, return_latent=True)
            return jnp.vdot(lat.astype(jnp.float32), probe_), lat

        def probe_fn(codes_, probe_):
            (_, lat), grads = jax.value_and_grad(loss_of_rt, has_aux=True)(
                gv["params"], codes_, probe_)
            gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                     for g in jax.tree_util.tree_leaves(grads))
            return jnp.swapaxes(lat, 1, 2), gn
        lat_shape = jax.eval_shape(
            lambda c: gpt.apply(gv, refer, text, text_lens, c, wav_lens,
                                return_latent=True), codes).shape
        probe_args = (codes, jnp.zeros(lat_shape, jnp.float32))
    elif kind == "latent_args":
        def probe_fn(gv_, codes_):
            lat = gpt.apply(gv_, refer, text, text_lens, codes_, wav_lens,
                            return_latent=True)
            return jnp.swapaxes(lat, 1, 2)
        probe_args = (gv, codes)
    else:
        def probe_fn(codes_):
            lat = gpt.apply(gv, refer, text, text_lens, codes_, wav_lens,
                            return_latent=True)
            return jnp.swapaxes(lat, 1, 2)
        probe_args = (codes,)

    t0 = time.time()
    lowered = jax.jit(probe_fn).lower(*probe_args)
    print(f"lowered {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compiled {time.time()-t0:.1f}s", flush=True)
    out = compiled(*probe_args)
    print(f"sum={float(np.asarray(out).sum()):.3e}", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one()
        return
    all_probes = PROBES + PROBES2
    probes = PROBES2 if os.environ.get("BISECT_WAVE") == "2" else PROBES
    only = os.environ.get("BISECT_ONLY")
    if only:
        names = {n.strip() for n in only.split(",")}
        probes = [p for p in all_probes if p["name"] in names]
    results = {}
    for spec in probes:
        name = spec["name"]
        env = dict(os.environ, BISECT_SPEC=json.dumps(spec))
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "one"],
                env=env, capture_output=True, text=True, timeout=TIMEOUT,
                check=False)
            ok = p.returncode == 0
            tail = (p.stdout + p.stderr).strip().splitlines()[-3:]
        except subprocess.TimeoutExpired as e:
            ok, tail = False, ["TIMEOUT (compile hang)"]
            so = e.stdout or b""
            if so:
                tail = so.decode()[-300:].splitlines()[-3:] + tail
        dt = time.time() - t0
        results[name] = {"ok": ok, "wall_s": round(dt, 1)}
        print(f"[{time.strftime('%H:%M:%S')}] {name}: "
              f"{'OK' if ok else 'FAIL'} in {dt:.0f}s | " + " | ".join(tail),
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
