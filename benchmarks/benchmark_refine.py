"""
Reference-tolerance accuracy ON the TPU: mixed-precision f64/f32 runs.

The TPU has no f64 LU, but elementwise f64 works (software-emulated), so
the mixed-precision path keeps state + residuals in f64 and runs the
direct band factorization/solves in f32 (``btd_factor_dtype='float32'``)
— the residual-certified Newton then refines each step to the f64 floor,
i.e. the reference's tolerances (abs 1e-8 / rel 1e-10, reference
``solverconst.py:1-6``) on the accelerator itself instead of only on a
host CPU.

Validates the M5 CAD trajectory against the committed f64 golden
(``tests/data/golden_m5cad_explicit.npz``) and reports the measured cost
multiple vs the plain f32 configuration.

Usage: python benchmark_refine.py   (runs on the default device)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

REPO = os.path.join(os.path.dirname(__file__), "..")
GOLDEN = os.path.join(REPO, "tests", "data", "golden_m5cad_explicit.npz")


def build(reorder="rcm"):
    from vf_fem_tpu.load import load_fsi_model
    from vf_fem_tpu.residuals import fluid as flr, solid as slr

    model = load_fsi_model(
        os.path.join(REPO, "meshes", "M5_CB_GA3.msh"),
        slr.KelvinVoigtWEpithelium,
        flr.BernoulliAreaRatioSep,
        coupling="explicit",
        reorder=reorder,
    )
    mesh = model.solid.residual.mesh()
    ymax = mesh.coords[:, 1].max()
    p = model.prop
    p["emod"][:] = 5e4
    p["rho"][:] = 1.0
    p["eta"][:] = 3.0
    p["nu"][:] = 0.45
    p["emod_membrane"][:] = 0.0
    p["nu_membrane"][:] = 0.3
    p["th_membrane"][:] = 0.0
    p["ycontact"][:] = ymax + 0.05
    p["kcontact"][:] = 1e8
    p["rho_air"][:] = 1.1225e-3
    p["r_sep"][:] = 1.0
    p["area_lb"][:] = 1e-4
    p["ymid"][:] = ymax + 0.01
    model.set_prop(p)
    model.control["psub"][:] = 8000.0
    model.control["psup"][:] = 0.0
    model.set_control(model.control)
    return model


def main():
    os.environ["VF_FEM_TPU_X64"] = "1"
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from vf_fem_tpu import forward
    from vf_fem_tpu.mesh.reorder import rcm_permutation
    from vf_fem_tpu.mesh import gmsh_io

    data = np.load(GOLDEN)
    times = np.asarray(data["times"])
    n_steps = len(times) - 1
    dev = jax.devices()[0]
    print(f"device: {dev.platform}, {n_steps} steps")

    model = build()
    ndof, dim = model.solid.ndof, model.solid.dim
    # the golden was generated on the un-reordered mesh: invert the RCM
    # vertex permutation to compare dof-wise
    mesh0 = gmsh_io.load_gmsh(
        os.path.join(REPO, "meshes", "M5_CB_GA3.msh")
    )
    perm = np.asarray(rcm_permutation(mesh0))  # new vertex i = old perm[i]

    def to_original(u_new):
        u = np.empty_like(u_new)
        for c in range(dim):
            u[..., perm * dim + c] = u_new[..., np.arange(len(perm)) * dim + c]
        return u

    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)

    def run(tol, dtype):
        s0 = {k: np.asarray(v, dtype=dtype) for k, v in state0.items()}
        p = {k: np.asarray(v, dtype=dtype) if np.issubdtype(
            np.asarray(v).dtype, np.floating) else np.asarray(v)
            for k, v in pd.items()}
        c = {k: np.asarray(v, dtype=dtype) for k, v in cs.items()}
        ts = np.asarray(times, dtype=dtype)
        t0 = time.perf_counter()
        fin, traj, infos = forward.integrate_pure(model, s0, c, p, ts, tol)
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), fin)
        ct = time.perf_counter() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            fin, traj, infos = forward.integrate_pure(
                model, s0, c, p, ts, tol
            )
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), fin)
            best = min(best, time.perf_counter() - t0)
        return traj, infos, n_steps / best, ct

    tol_f64 = {
        "linear_solver": "btd",
        "btd_factor_dtype": "float32",
        "assembly": "plain",
        "jacobian_refresh_steps": 8,
        "absolute_tolerance": 1e-8,
        "relative_tolerance": 1e-10,
    }
    traj64, infos64, tps64, ct64 = run(tol_f64, np.float64)
    u64 = to_original(np.asarray(traj64["u"]))
    err_u = np.abs(u64[::8] - np.asarray(data["u"])).max()
    err_q = np.abs(
        np.asarray(traj64["q"]).ravel() - np.asarray(data["q"])
    ).max() / max(np.abs(np.asarray(data["q"])).max(), 1e-30)
    print(
        f"f64 (f32 factors): {tps64:.1f} steps/s (compile {ct64:.0f}s);"
        f" max |u - golden| = {err_u:.2e} (reference abs tol 1e-8),"
        f" rel q err {err_q:.2e};"
        f" max Newton abs_err {float(np.asarray(infos64.abs_err).max()):.2e}"
    )

    tol_f32 = {
        "linear_solver": "btd",
        "assembly": "plain",
        "jacobian_refresh_steps": 8,
        "stagnation_ratio": 0.5,
    }
    # the f32 leg must run with x64 disabled: in an x64 process the f64
    # numpy constants embedded in the model (coordinates, quadrature,
    # BC masks) promote the f32 state mid-step and the scan carries
    # mix dtypes
    jax.config.update("jax_enable_x64", False)
    traj32, infos32, tps32, ct32 = run(tol_f32, np.float32)
    u32 = to_original(np.asarray(traj32["u"], dtype=np.float64))
    err32 = np.abs(u32[::8] - np.asarray(data["u"])).max()
    print(
        f"f32 reference:     {tps32:.1f} steps/s (compile {ct32:.0f}s);"
        f" max |u - golden| = {err32:.2e}"
    )
    print(
        f"f64 cost multiple: {tps32 / tps64:.2f}x; accuracy gain:"
        f" {err32 / max(err_u, 1e-30):.0f}x"
    )
    assert err_u < 1e-8, "f64 TPU trajectory missed the reference tolerance"


if __name__ == "__main__":
    main()
