"""Gaussian diffusion process library (TPU re-design of
ttts/utils/diffusion.py — the OpenAI guided-diffusion lineage).

Everything is precomputed numpy converted to jnp constants; sampling loops are
`lax.scan` programs (fixed step count, no host round-trips); classifier-free
guidance batches cond/uncond into one 2B model call instead of the reference's
two sequential forwards (ttts/utils/diffusion.py:313-315).

Shipped-path semantics preserved:
* linear 1000-step schedule scaled by 1000/T (get_named_beta_schedule :83-105)
* SpacedDiffusion re-spacing + timestep_map model remap (:1172-1302)
* epsilon prediction + learned-range variance interpolation (:317-332)
* CFG mix (1+k)*cond - k*uncond with the linear ramp
  cfk = k * (1 - t_orig/T_orig) (:349-355)
* training_losses = MSE(eps) + vb with frozen mean (:930-1014)
"""
from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# schedules

def get_named_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    if name == "linear":
        scale = 1000.0 / num_steps
        return np.linspace(scale * 0.0001, scale * 0.02, num_steps,
                           dtype=np.float64)
    if name == "cosine":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        betas = []
        for i in range(num_steps):
            t1, t2 = i / num_steps, (i + 1) / num_steps
            betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), 0.999))
        return np.array(betas, dtype=np.float64)
    raise NotImplementedError(name)


def space_timesteps(num_timesteps: int, section_counts) -> set:
    """Subset of original timesteps (ttts/utils/diffusion.py space_timesteps)."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return set(range(0, num_timesteps, i))
            raise ValueError(f"cannot create {desired} steps with integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    if isinstance(section_counts, int):
        section_counts = [section_counts]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx, all_steps = 0, []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur, taken = 0.0, []
        for _ in range(count):
            taken.append(start_idx + round(cur))
            cur += stride
        all_steps += taken
        start_idx += size
    return set(all_steps)


# --------------------------------------------------------------------------

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
# model(x (B,C,T), t_orig (B,)) -> (B, 2C, T) [eps ; var_frac]
CFGModelFn = Callable[[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]
# -> (cond_out, uncond_out)


@dataclass(frozen=True)
class GaussianDiffusion:
    """Precomputed process constants. Immutable + hashable enough to close
    over in jitted functions."""

    betas: np.ndarray
    timestep_map: Optional[np.ndarray] = None       # spaced -> original t
    original_num_steps: int = 0
    conditioning_free: bool = False
    conditioning_free_k: float = 1.0
    ramp_conditioning_free: bool = True
    base_betas: Optional[np.ndarray] = field(default=None, repr=False)
    # full training schedule retained by spaced() for the continuous-time
    # external solvers (solver_sample_loop)

    # derived (filled in __post_init__)
    alphas_cumprod: np.ndarray = field(default=None, repr=False)
    alphas_cumprod_prev: np.ndarray = field(default=None, repr=False)
    sqrt_alphas_cumprod: np.ndarray = field(default=None, repr=False)
    sqrt_one_minus_alphas_cumprod: np.ndarray = field(default=None, repr=False)
    sqrt_recip_alphas_cumprod: np.ndarray = field(default=None, repr=False)
    sqrt_recipm1_alphas_cumprod: np.ndarray = field(default=None, repr=False)
    posterior_variance: np.ndarray = field(default=None, repr=False)
    posterior_log_variance_clipped: np.ndarray = field(default=None, repr=False)
    posterior_mean_coef1: np.ndarray = field(default=None, repr=False)
    posterior_mean_coef2: np.ndarray = field(default=None, repr=False)

    def __post_init__(self):
        betas = np.asarray(self.betas, dtype=np.float64)
        object.__setattr__(self, "betas", betas)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        object.__setattr__(self, "alphas_cumprod", acp)
        object.__setattr__(self, "alphas_cumprod_prev", acp_prev)
        object.__setattr__(self, "sqrt_alphas_cumprod", np.sqrt(acp))
        object.__setattr__(self, "sqrt_one_minus_alphas_cumprod", np.sqrt(1 - acp))
        object.__setattr__(self, "sqrt_recip_alphas_cumprod", np.sqrt(1.0 / acp))
        object.__setattr__(self, "sqrt_recipm1_alphas_cumprod", np.sqrt(1.0 / acp - 1))
        object.__setattr__(self, "posterior_variance", post_var)
        object.__setattr__(self, "posterior_log_variance_clipped",
                           np.log(np.append(post_var[1], post_var[1:])))
        object.__setattr__(self, "posterior_mean_coef1",
                           betas * np.sqrt(acp_prev) / (1.0 - acp))
        object.__setattr__(self, "posterior_mean_coef2",
                           (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp))
        if self.original_num_steps == 0:
            object.__setattr__(self, "original_num_steps", len(betas))

    # ------------------------------------------------------------------

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)

    def map_t(self, t):
        """Spaced index -> original timestep fed to the model."""
        if self.timestep_map is None:
            return t
        return jnp.asarray(self.timestep_map)[t]

    @staticmethod
    def spaced(
        num_train_steps: int = 1000,
        sampling_steps: int = 50,
        schedule: str = "linear",
        **kw,
    ) -> "GaussianDiffusion":
        """SpacedDiffusion equivalent (ttts/utils/diffusion.py:1181-1196)."""
        base_betas = get_named_beta_schedule(schedule, num_train_steps)
        acp = np.cumprod(1.0 - base_betas)
        use = space_timesteps(num_train_steps, sampling_steps)
        new_betas, tmap, last = [], [], 1.0
        for i, a in enumerate(acp):
            if i in use:
                new_betas.append(1 - a / last)
                last = a
                tmap.append(i)
        return GaussianDiffusion(
            betas=np.array(new_betas), timestep_map=np.array(tmap),
            original_num_steps=num_train_steps, base_betas=base_betas, **kw)

    # ------------------------------------------------------------------
    # q process

    def _ex(self, arr: np.ndarray, t, shape) -> jnp.ndarray:
        """Extract per-t scalars broadcast to `shape` (B leading)."""
        vals = jnp.asarray(arr, jnp.float32)[t]
        return vals.reshape(vals.shape + (1,) * (len(shape) - 1))

    def q_sample(self, x_start, t, noise):
        return (self._ex(self.sqrt_alphas_cumprod, t, x_start.shape) * x_start
                + self._ex(self.sqrt_one_minus_alphas_cumprod, t, x_start.shape)
                * noise)

    def q_posterior_mean(self, x_start, x_t, t):
        return (self._ex(self.posterior_mean_coef1, t, x_t.shape) * x_start
                + self._ex(self.posterior_mean_coef2, t, x_t.shape) * x_t)

    def predict_xstart_from_eps(self, x_t, t, eps):
        return (self._ex(self.sqrt_recip_alphas_cumprod, t, x_t.shape) * x_t
                - self._ex(self.sqrt_recipm1_alphas_cumprod, t, x_t.shape) * eps)

    # ------------------------------------------------------------------
    # p process

    def _cfg_scale(self, t):
        """Ramped guidance strength (ttts/utils/diffusion.py:349-355): the
        reference computes 1 - t/num_timesteps on the SPACED index and spaced
        count (rescale_timesteps False), not on the mapped original t."""
        if not self.ramp_conditioning_free:
            return self.conditioning_free_k
        t = jnp.asarray(t).astype(jnp.float32)
        return self.conditioning_free_k * (1.0 - t / self.num_timesteps)

    def p_mean_variance_from_output(self, model_output, x, t,
                                    model_output_uncond=None):
        """Split eps/var, learned-range log-variance, CFG mix, posterior mean.
        t is the *spaced* index (B,). Returns dict of jnp arrays."""
        c = x.shape[1]
        eps, var_frac = jnp.split(model_output, 2, axis=1)
        if model_output_uncond is not None:
            eps_uc = jnp.split(model_output_uncond, 2, axis=1)[0]
            cfk = self._cfg_scale(t)
            cfk = cfk.reshape(cfk.shape + (1,) * (x.ndim - 1))
            eps = (1 + cfk) * eps - cfk * eps_uc

        min_log = self._ex(self.posterior_log_variance_clipped, t, x.shape)
        max_log = self._ex(np.log(self.betas), t, x.shape)
        frac = (var_frac + 1) / 2
        model_log_var = frac * max_log + (1 - frac) * min_log

        pred_xstart = jnp.clip(self.predict_xstart_from_eps(x, t, eps), -1, 1)
        mean = self.q_posterior_mean(pred_xstart, x, t)
        return {"mean": mean, "log_variance": model_log_var,
                "pred_xstart": pred_xstart, "eps": eps}

    # ------------------------------------------------------------------
    # sampling loops (lax.scan)

    def p_sample_loop(self, model_fn, shape, key, noise=None,
                      model_fn_uncond=None):
        """Ancestral sampling over all (spaced) steps — the live inference
        path (do_spectrogram_diffusion -> p_sample_loop, test.py:163).

        model_fn(x, t_orig) -> (B, 2C, T); model_fn_uncond likewise for the
        conditioning-free branch (hint replaced by the learned embedding).

        key may be one PRNGKey (2,) — batch-level noise, the reference's
        semantics (ttts/utils/diffusion.py:654-743) — or PER-ROW keys
        (B, 2): each row's ancestral noise chain then depends only on its
        own key, making the sampled output a pure per-row function
        (continuous-batching determinism, infer/slots.py).
        """
        per_row = key.ndim == 2
        if per_row:
            assert key.shape[0] == shape[0], (key.shape, shape)
            splits = jax.vmap(jax.random.split)(key)     # (B, 2, 2)
            key, nk = splits[:, 0], splits[:, 1]
            x = (noise if noise is not None else
                 jax.vmap(lambda k: jax.random.normal(k, shape[1:]))(nk))
        else:
            key, nk = jax.random.split(key)
            x = noise if noise is not None else jax.random.normal(nk, shape)
        steps = self.num_timesteps
        b = shape[0]

        def body(carry, i):
            x, key = carry
            if per_row:
                splits = jax.vmap(jax.random.split)(key)
                key, sub = splits[:, 0], splits[:, 1]
                z = jax.vmap(
                    lambda k: jax.random.normal(k, x.shape[1:]))(sub)
            else:
                key, sub = jax.random.split(key)
                z = jax.random.normal(sub, x.shape)
            t = jnp.full((b,), steps - 1 - i, jnp.int32)
            t_orig = self.map_t(t)
            out = model_fn(x, t_orig)
            out_uc = None
            if isinstance(out, tuple):          # paired cond/uncond call
                out, out_uc = out
            elif self.conditioning_free:
                assert model_fn_uncond is not None
                out_uc = model_fn_uncond(x, t_orig)
            pmv = self.p_mean_variance_from_output(out, x, t, out_uc)
            nonzero = (t[0] != 0).astype(x.dtype)
            x = pmv["mean"] + nonzero * jnp.exp(0.5 * pmv["log_variance"]) * z
            return (x, key), None

        # Unrolling the scan body lets XLA overlap the next step's weight
        # prefetch with the current step's compute (the denoise step is
        # prefetch-scheduling-bound, not FLOP-bound — PERF.md round-3
        # profile). Interleaved A/B at the flagship bucket-320 CFG shape:
        # unroll=2 is 1.033x, unroll=4 1.035x — default 2 (unroll=4 doubles
        # the marginal compile time for 0.2%). Static at trace time;
        # override with XTTS_SCAN_UNROLL.
        try:
            unroll = max(1, int(os.environ.get("XTTS_SCAN_UNROLL", "2")))
        except ValueError:
            unroll = 2
        (x, _), _ = jax.lax.scan(body, (x, key), jnp.arange(steps),
                                 unroll=unroll)
        return x

    def ddim_sample_loop(self, model_fn, shape, key, noise=None,
                         model_fn_uncond=None, eta: float = 0.0):
        """DDIM (ttts/utils/diffusion.py:744-902) as lax.scan."""
        key, nk = jax.random.split(key)
        x = noise if noise is not None else jax.random.normal(nk, shape)
        steps = self.num_timesteps
        b = shape[0]
        acp = jnp.asarray(self.alphas_cumprod, jnp.float32)
        acp_prev = jnp.asarray(self.alphas_cumprod_prev, jnp.float32)

        def body(carry, i):
            x, key = carry
            key, sub = jax.random.split(key)
            t = jnp.full((b,), steps - 1 - i, jnp.int32)
            t_orig = self.map_t(t)
            out = model_fn(x, t_orig)
            if isinstance(out, tuple):
                out, out_uc = out
            else:
                out_uc = (model_fn_uncond(x, t_orig)
                          if self.conditioning_free else None)
            pmv = self.p_mean_variance_from_output(out, x, t, out_uc)
            # re-derive eps from the (clipped) xstart like the reference
            eps = ((self._ex(self.sqrt_recip_alphas_cumprod, t, x.shape) * x
                    - pmv["pred_xstart"])
                   / self._ex(self.sqrt_recipm1_alphas_cumprod, t, x.shape))
            ab = self._ex(acp, t, x.shape)
            ab_prev = self._ex(acp_prev, t, x.shape)
            sigma = (eta * jnp.sqrt((1 - ab_prev) / (1 - ab))
                     * jnp.sqrt(1 - ab / ab_prev))
            mean = (pmv["pred_xstart"] * jnp.sqrt(ab_prev)
                    + jnp.sqrt(1 - ab_prev - sigma ** 2) * eps)
            z = jax.random.normal(sub, x.shape)
            nonzero = (t[0] != 0).astype(x.dtype)
            x = mean + nonzero * sigma * z
            return (x, key), None

        (x, _), _ = jax.lax.scan(body, (x, key), jnp.arange(steps))
        return x

    def dpmpp_2m_sample_loop(self, model_fn, shape, key, noise=None,
                             model_fn_uncond=None):
        """DPM-Solver++(2M) multistep over the spaced schedule — the
        `sampler='dpm++2m'` path (ttts/utils/diffusion.py:487-638 via
        ttts/sampler/dpm_solver.py), data-prediction form with constant-k CFG
        (the k-diffusion path does not ramp)."""
        key, nk = jax.random.split(key)
        x = noise if noise is not None else jax.random.normal(nk, shape)
        steps = self.num_timesteps
        b = shape[0]
        acp = np.asarray(self.alphas_cumprod)
        alpha = np.sqrt(acp)                     # signal scale
        sigma = np.sqrt(1.0 - acp)               # noise scale
        lam = np.log(alpha) - np.log(sigma)      # log-SNR/2

        alpha_j = jnp.asarray(alpha, jnp.float32)
        sigma_j = jnp.asarray(sigma, jnp.float32)
        lam_j = jnp.asarray(lam, jnp.float32)

        def pred_x0(x, idx):
            t = jnp.full((b,), idx, jnp.int32)
            t_orig = self.map_t(t)
            out = model_fn(x, t_orig)
            out_uc = None
            if isinstance(out, tuple):
                out, out_uc = out
            elif self.conditioning_free:
                out_uc = model_fn_uncond(x, t_orig)
            eps = jnp.split(out, 2, axis=1)[0]
            if out_uc is not None:
                eps_uc = jnp.split(out_uc, 2, axis=1)[0]
                k = self.conditioning_free_k
                # model_wrapper's classifier-free mix u + k*(c-u)
                # (ttts/sampler/dpm_solver.py:322-330) — the k-diffusion live
                # path does NOT use the ancestral (1+k)c - k*u ramped form
                eps = eps_uc + k * (eps - eps_uc)
            x0 = self.predict_xstart_from_eps(x, t, eps)
            return jnp.clip(x0, -1, 1)

        # step from spaced idx i -> i-1 (t decreasing); first step is Euler
        def body(carry, step):
            x, x0_prev, h_prev = carry
            i = steps - 1 - step          # current spaced index
            x0 = pred_x0(x, i)
            i_next = jnp.maximum(i - 1, 0)
            lam_cur, lam_next = lam_j[i], lam_j[i_next]
            h = lam_next - lam_cur
            r = h_prev / jnp.maximum(h, 1e-12)
            denom = 2.0 * jnp.maximum(r, 1e-12)
            use_multi = (step > 0).astype(x.dtype)
            d = (1 + use_multi / denom) * x0 - (use_multi / denom) * x0_prev
            x_next = (sigma_j[i_next] / sigma_j[i]) * x \
                - alpha_j[i_next] * jnp.expm1(-h) * d
            # last step: return the data prediction directly
            x_next = jnp.where(step == steps - 1, x0, x_next)
            return (x_next, x0, h), None

        (x, _, _), _ = jax.lax.scan(
            body, (x, jnp.zeros_like(x), jnp.asarray(0.0)), jnp.arange(steps))
        return x

    def unipc_sample_loop(self, model_fn, shape, key, noise=None,
                          model_fn_uncond=None):
        """Order-2 predictor-corrector in log-SNR space (the UniPC family,
        ttts/sampler/uni_pc.py — unused in the reference's live path).

        Predictor = DPM-Solver++(2M) multistep extrapolation; corrector =
        trapezoidal update using a model eval at the predicted point
        (UniC-2 with the midpoint B(h)). Two denoiser calls per step, so at
        equal step count it costs 2x dpm++2m but tracks the probability-flow
        ODE one order tighter — useful at very low step counts (<=15).
        """
        key, nk = jax.random.split(key)
        x = noise if noise is not None else jax.random.normal(nk, shape)
        steps = self.num_timesteps
        b = shape[0]
        acp = np.asarray(self.alphas_cumprod)
        alpha = np.sqrt(acp)
        sigma = np.sqrt(1.0 - acp)
        lam = np.log(alpha) - np.log(sigma)
        alpha_j = jnp.asarray(alpha, jnp.float32)
        sigma_j = jnp.asarray(sigma, jnp.float32)
        lam_j = jnp.asarray(lam, jnp.float32)

        def pred_x0(x, idx):
            t = jnp.full((b,), idx, jnp.int32)
            t_orig = self.map_t(t)
            out = model_fn(x, t_orig)
            out_uc = None
            if isinstance(out, tuple):
                out, out_uc = out
            elif self.conditioning_free:
                out_uc = model_fn_uncond(x, t_orig)
            eps = jnp.split(out, 2, axis=1)[0]
            if out_uc is not None:
                eps_uc = jnp.split(out_uc, 2, axis=1)[0]
                k = self.conditioning_free_k
                eps = eps_uc + k * (eps - eps_uc)   # model_wrapper mix
            x0 = self.predict_xstart_from_eps(x, t, eps)
            return jnp.clip(x0, -1, 1)

        def body(carry, step):
            x, m_prev, h_prev = carry
            i = steps - 1 - step
            i_next = jnp.maximum(i - 1, 0)
            m0 = pred_x0(x, i)
            h = lam_j[i_next] - lam_j[i]
            scale = sigma_j[i_next] / sigma_j[i]
            phi1 = jnp.expm1(-h)
            # predictor: multistep extrapolation to the lambda-midpoint
            r = h_prev / jnp.maximum(h, 1e-12)
            use_multi = (step > 0).astype(x.dtype)
            d_p = m0 + use_multi * (m0 - m_prev) / jnp.maximum(2 * r, 1e-12)
            x_p = scale * x - alpha_j[i_next] * phi1 * d_p
            # corrector: eval at the predicted point, trapezoid in lambda
            m1 = pred_x0(x_p, i_next)
            x_c = scale * x - alpha_j[i_next] * phi1 * 0.5 * (m0 + m1)
            x_next = jnp.where(step == steps - 1, m1, x_c)
            return (x_next, m0, h), None

        (x, _, _), _ = jax.lax.scan(
            body, (x, jnp.zeros_like(x), jnp.asarray(0.0)), jnp.arange(steps))
        return x

    def solver_sample_loop(self, model_fn, shape, key, noise=None,
                           model_fn_uncond=None, *, method="multistep",
                           order=2, variant=None,
                           algorithm="dpmsolver++",
                           skip_type="time_uniform"):
        """Reference-exact external-sampler path (k_diffusion_sample_loop,
        ttts/utils/diffusion.py:487-638): a continuous-time DPM-Solver /
        UniPC run over the BASE training schedule with NFE = the spaced step
        count. The model receives float base-schedule times (the reference
        feeds t*1000 directly, :538-541) and CFG uses the model_wrapper mix
        u + k*(c - u) (ttts/sampler/dpm_solver.py:322-330)."""
        from xtts_tpu.diffusion import solvers as S
        base = self.base_betas if self.base_betas is not None else self.betas
        ns = S.NoiseScheduleVP("discrete", betas=np.asarray(base, np.float64))
        k = self.conditioning_free_k
        cfree = self.conditioning_free

        def eps_fn(x, t_input):
            out = model_fn(x, t_input)
            out_uc = None
            if isinstance(out, tuple):
                out, out_uc = out
            elif cfree:
                assert model_fn_uncond is not None
                out_uc = model_fn_uncond(x, t_input)
            eps = jnp.split(out, 2, axis=1)[0]
            if out_uc is not None:
                eps_uc = jnp.split(out_uc, 2, axis=1)[0]
                eps = eps_uc + k * (eps - eps_uc)
            return eps

        key, nk = jax.random.split(key)
        x = noise if noise is not None else jax.random.normal(nk, shape)
        steps = self.num_timesteps
        if variant is not None:
            return S.sample_unipc(eps_fn, ns, x, steps=steps, order=order,
                                  variant=variant, skip_type=skip_type)
        return S.sample_dpm_solver(eps_fn, ns, x, steps=steps, order=order,
                                   method=method, algorithm_type=algorithm,
                                   skip_type=skip_type)

    def sample_loop(self, model_fn, shape, key, noise=None,
                    model_fn_uncond=None, sampler: str = "p"):
        import functools as _ft
        solver = _ft.partial  # brevity
        fns = {"p": self.p_sample_loop, "ddim": self.ddim_sample_loop,
               "dpm++2m": self.dpmpp_2m_sample_loop,
               "unipc": self.unipc_sample_loop,
               # continuous-time external solvers (solver_sample_loop)
               "dpm++2m_solver": solver(self.solver_sample_loop, order=2),
               "dpm++3m": solver(self.solver_sample_loop, order=3),
               "dpm++fast": solver(self.solver_sample_loop, order=3,
                                   method="singlestep"),
               "unipc_bh1": solver(self.solver_sample_loop, order=2,
                                   variant="bh1"),
               "unipc_bh2": solver(self.solver_sample_loop, order=2,
                                   variant="bh2"),
               "unipc_vary": solver(self.solver_sample_loop, order=2,
                                    variant="vary_coeff")}
        return fns[sampler](model_fn, shape, key, noise=noise,
                            model_fn_uncond=model_fn_uncond)

    # ------------------------------------------------------------------
    # training

    def training_losses(self, model_fn, x_start, t, key=None, noise=None):
        """MSE(eps) + frozen-mean vb term (ttts/utils/diffusion.py:963-1014).
        Returns dict with per-example 'loss', 'mse', 'vb'. Pass either a PRNG
        key or an explicit noise tensor (parity tests)."""
        if noise is None:
            noise = jax.random.normal(key, x_start.shape)
        x_t = self.q_sample(x_start, t, noise)
        # loss math runs f32 even for bf16-compute models (the vb term's
        # log-variance/KL chain is precision-sensitive)
        model_output = model_fn(x_t, self.map_t(t)).astype(jnp.float32)
        eps, var_frac = jnp.split(model_output, 2, axis=1)

        frozen = jnp.concatenate([jax.lax.stop_gradient(eps), var_frac], axis=1)
        vb = self._vb_terms(frozen, x_start, x_t, t)
        mse = _mean_flat((noise - eps) ** 2)
        return {"loss": mse + vb, "mse": mse, "vb": vb,
                "x_start_predicted": self.predict_xstart_from_eps(x_t, t, eps)}

    def _vb_terms(self, model_output, x_start, x_t, t):
        """KL(q(x_{t-1}|x_t,x_0) || p) in bits, decoder NLL at t=0."""
        pmv = self.p_mean_variance_from_output(model_output, x_t, t)
        true_mean = self.q_posterior_mean(x_start, x_t, t)
        true_logvar = self._ex(self.posterior_log_variance_clipped, t, x_t.shape)
        kl = _normal_kl(true_mean, true_logvar, pmv["mean"], pmv["log_variance"])
        kl = _mean_flat(kl) / math.log(2.0)
        decoder_nll = -_discretized_gaussian_log_likelihood(
            x_start, pmv["mean"], 0.5 * pmv["log_variance"])
        decoder_nll = _mean_flat(decoder_nll) / math.log(2.0)
        return jnp.where(t == 0, decoder_nll, kl)


def _mean_flat(x):
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def _normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def _approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi)
                                 * (x + 0.044715 * x ** 3)))


def _discretized_gaussian_log_likelihood(x, means, log_scales):
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = _approx_standard_normal_cdf(plus_in)
    cdf_min = _approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, min=1e-12))))
