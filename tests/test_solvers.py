"""Golden parity: xtts_tpu.diffusion.solvers vs the REFERENCE torch samplers
(ttts/sampler/dpm_solver.py, ttts/sampler/uni_pc.py), loaded directly from
/root/reference (pure torch, no stubs needed).

Both sides run the same analytic linear "eps model" from the same x_T; the
tests assert the final samples agree to f32 tolerance across the full option
matrix: DPM-Solver / DPM-Solver++ x orders 1-3 x singlestep/multistep x
dpmsolver/taylor x time grids, UniPC bh1/bh2/vary_coeff x data/noise
prediction, dynamic thresholding, denoise_to_zero, discrete + continuous
noise schedules.
"""
import importlib.util
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from xtts_tpu.diffusion import solvers

B, C, T = 2, 3, 8
SHAPE = (B, C, T)


def _load_ref(name):
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", f"/root/reference/ttts/sampler/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref_dpm = _load_ref("dpm_solver")
ref_unipc = _load_ref("uni_pc")

BETAS = np.linspace(1e-4, 0.02, 1000)
RNG = np.random.default_rng(0)
CVEC = RNG.standard_normal(SHAPE).astype(np.float32)
X_T = RNG.standard_normal(SHAPE).astype(np.float32)


def eps_np(x, t):
    """Analytic eps model, linear in x; t is model-input time (~[0, 1000))."""
    a = 0.4 * np.cos(t / 300.0)
    b = 0.2 * np.sin(t / 200.0)
    return a * x + b


def torch_model(x, t_input):
    a = 0.4 * torch.cos(t_input / 300.0).reshape(-1, 1, 1)
    b = 0.2 * torch.sin(t_input / 200.0).reshape(-1, 1, 1)
    return a * x + b * torch.from_numpy(CVEC)


def jax_eps(x, t_input):
    a = 0.4 * jnp.cos(t_input / 300.0).reshape(-1, 1, 1)
    b = 0.2 * jnp.sin(t_input / 200.0).reshape(-1, 1, 1)
    return a * x + b * jnp.asarray(CVEC)


def make_ns(schedule="discrete"):
    if schedule == "discrete":
        ours = solvers.NoiseScheduleVP("discrete", betas=BETAS)
        ref = ref_dpm.NoiseScheduleVP("discrete",
                                      betas=torch.from_numpy(BETAS).float())
    else:
        ours = solvers.NoiseScheduleVP("linear", continuous_beta_0=0.025,
                                       continuous_beta_1=5.0)
        ref = ref_dpm.NoiseScheduleVP("linear", continuous_beta_0=0.025,
                                      continuous_beta_1=5.0)
    return ours, ref


def run_ref_dpm(ref_ns, **kw):
    model_fn = ref_dpm.model_wrapper(torch_model, ref_ns, model_type="noise")
    solver = ref_dpm.DPM_Solver(
        model_fn, ref_ns, algorithm_type=kw.pop("algorithm_type"),
        correcting_x0_fn=kw.pop("correcting_x0_fn", None))
    with torch.no_grad():
        out = solver.sample(torch.from_numpy(X_T.copy()), **kw)
    return np.asarray(out)


def run_ref_unipc(ref_ns, variant, predict_x0, **kw):
    model_fn = ref_unipc.model_wrapper(torch_model, ref_ns,
                                       model_type="noise")
    solver = ref_unipc.UniPC(
        model_fn, ref_ns, variant=variant,
        algorithm_type="data_prediction" if predict_x0 else "noise_prediction")
    with torch.no_grad():
        out = solver.sample(torch.from_numpy(X_T.copy()), method="multistep",
                            **kw)
    return np.asarray(out)


@pytest.mark.parametrize("alg", ["dpmsolver++", "dpmsolver"])
@pytest.mark.parametrize("stype", ["dpmsolver", "taylor"])
@pytest.mark.parametrize("order,steps", [(1, 6), (2, 8), (3, 8), (2, 12),
                                         (3, 13)])
def test_dpm_multistep_parity(alg, stype, order, steps):
    ours_ns, ref_ns = make_ns()
    ref = run_ref_dpm(ref_ns, algorithm_type=alg, steps=steps, order=order,
                      method="multistep", solver_type=stype)
    got = solvers.sample_dpm_solver(
        jax_eps, ours_ns, jnp.asarray(X_T), steps=steps, order=order,
        method="multistep", algorithm_type=alg, solver_type=stype)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("alg", ["dpmsolver++", "dpmsolver"])
@pytest.mark.parametrize("stype", ["dpmsolver", "taylor"])
@pytest.mark.parametrize("order,steps,method", [
    (2, 7, "singlestep"), (3, 8, "singlestep"), (2, 8, "singlestep_fixed"),
    (3, 9, "singlestep_fixed"),
])
def test_dpm_singlestep_parity(alg, stype, order, steps, method):
    ours_ns, ref_ns = make_ns()
    ref = run_ref_dpm(ref_ns, algorithm_type=alg, steps=steps, order=order,
                      method=method, solver_type=stype)
    got = solvers.sample_dpm_solver(
        jax_eps, ours_ns, jnp.asarray(X_T), steps=steps, order=order,
        method=method, algorithm_type=alg, solver_type=stype)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("skip", ["logSNR", "time_quadratic"])
def test_dpm_skip_types(skip):
    ours_ns, ref_ns = make_ns()
    ref = run_ref_dpm(ref_ns, algorithm_type="dpmsolver++", steps=10, order=2,
                      method="multistep", skip_type=skip)
    got = solvers.sample_dpm_solver(
        jax_eps, ours_ns, jnp.asarray(X_T), steps=10, order=2,
        method="multistep", skip_type=skip)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


def test_dpm_continuous_schedule():
    ours_ns, ref_ns = make_ns("linear")
    ref = run_ref_dpm(ref_ns, algorithm_type="dpmsolver++", steps=10, order=2,
                      method="multistep")
    got = solvers.sample_dpm_solver(jax_eps, ours_ns, jnp.asarray(X_T),
                                    steps=10, order=2, method="multistep")
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


def test_dpm_denoise_to_zero_and_thresholding():
    ours_ns, ref_ns = make_ns()
    ref = run_ref_dpm(ref_ns, algorithm_type="dpmsolver++", steps=8, order=2,
                      method="multistep", denoise_to_zero=True,
                      correcting_x0_fn="dynamic_thresholding")
    got = solvers.sample_dpm_solver(
        jax_eps, ours_ns, jnp.asarray(X_T), steps=8, order=2,
        method="multistep", denoise_to_zero=True,
        correcting_x0_fn="dynamic_thresholding")
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


def test_dynamic_thresholding_unit():
    x0 = RNG.standard_normal((2, 4, 16)).astype(np.float32) * 3.0
    want = ref_dpm.DPM_Solver(
        lambda x, t: x, make_ns()[1],
        correcting_x0_fn="dynamic_thresholding").dynamic_thresholding_fn(
            torch.from_numpy(x0), None)
    got = solvers.dynamic_thresholding(jnp.asarray(x0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("variant", ["bh1", "bh2", "vary_coeff"])
@pytest.mark.parametrize("order", [1, 2, 3])
def test_unipc_parity(variant, order):
    steps = max(order, 8)
    ours_ns, ref_ns = make_ns()
    ref = run_ref_unipc(ref_ns, variant, True, steps=steps, order=order)
    got = solvers.sample_unipc(jax_eps, ours_ns, jnp.asarray(X_T),
                               steps=steps, order=order, variant=variant,
                               predict_x0=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("variant", ["bh1", "bh2"])
def test_unipc_noise_prediction_parity(variant):
    ours_ns, ref_ns = make_ns()
    ref = run_ref_unipc(ref_ns, variant, False, steps=8, order=2)
    got = solvers.sample_unipc(jax_eps, ours_ns, jnp.asarray(X_T), steps=8,
                               order=2, variant=variant, predict_x0=False)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


def test_guidance_mix_matches_model_wrapper():
    """wrap_guidance == model_wrapper's classifier-free mix u + s(c-u)
    (dpm_solver.py:322-330)."""
    ours_ns, ref_ns = make_ns()

    def cond_t(x, t):
        return torch_model(x, t)

    def uncond_t(x, t):
        return 0.5 * torch_model(x, t) + 0.1

    def prewrap(x, t, cond=None):
        # the reference doubles the batch: [uncond ; cond]
        xh = x[:B]
        th = t[:B]
        return torch.cat([uncond_t(xh, th), cond_t(xh, th)])

    model_fn = ref_dpm.model_wrapper(
        prewrap, ref_ns, model_type="noise", guidance_type="classifier-free",
        condition=torch.ones(1), unconditional_condition=torch.ones(1),
        guidance_scale=2.0)
    solver = ref_dpm.DPM_Solver(model_fn, ref_ns,
                                algorithm_type="dpmsolver++")
    with torch.no_grad():
        ref = np.asarray(solver.sample(torch.from_numpy(X_T.copy()), steps=8,
                                       order=2, method="multistep"))

    guided = solvers.wrap_guidance(
        jax_eps,
        lambda x, t: 0.5 * jax_eps(x, t) + 0.1,
        2.0)
    got = solvers.sample_unipc  # silence linters; real call below
    got = solvers.sample_dpm_solver(guided, ours_ns, jnp.asarray(X_T),
                                    steps=8, order=2, method="multistep")
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


def test_solver_loops_jit_and_scan():
    """The multistep samplers compile (jit) with the model traced once."""
    ours_ns, _ = make_ns()
    calls = []

    def counting_eps(x, t):
        calls.append(1)
        return jax_eps(x, t)

    f = jax.jit(lambda x: solvers.sample_dpm_solver(
        counting_eps, ours_ns, x, steps=20, order=2, method="multistep"))
    out = f(jnp.asarray(X_T))
    assert out.shape == SHAPE
    # scan body traces the model a constant number of times, not 20
    assert len(calls) <= 4
