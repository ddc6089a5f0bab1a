"""
End-to-end voice synthesis: two-way coupled FSAI phonation -> WAV.

ONE integrate of the fully coupled fluid-solid-acoustic model
(``load_fsai_model``): inside every scanned step the M5 CAD fold's
glottal flow drives the 1D wave-reflection-analog vocal tract AND the
tract's input pressure feeds back as the fluid's supraglottal boundary
pressure (the coupling the reference keeps as dead code, reference
``transient.py:1147-1595``).  The radiated mouth pressure is written as
a WAV file and its spectrum reported (f0 + formants).

Everything runs at the tract's locked time step dt = (2 L / N) / c.

Usage: python voice_synthesis.py [--seconds 0.12] [--wav voice.wav]
"""

import argparse
import os
import sys
import time
import wave

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
if jax.devices()[0].platform != "cpu":
    os.environ["VF_FEM_TPU_X64"] = "0"
    jax.config.update("jax_enable_x64", False)

import numpy as np

from vf_fem_tpu import forward
from vf_fem_tpu.load import load_fsai_model
from vf_fem_tpu.mesh import load_gmsh
from vf_fem_tpu.misc.signal import fundamental_mode_from_rfft
from vf_fem_tpu.residuals import fluid as flr, solid as slr

MESH = os.path.join(os.path.dirname(__file__), "..", "meshes",
                    "M5_CB_GA3.msh")


def build_fsai(n_tube):
    mesh = load_gmsh(MESH)
    model = load_fsai_model(
        mesh, slr.KelvinVoigt, flr.BernoulliAreaRatioSep,
        num_tube=n_tube,
    )
    ymax = mesh.coords[:, 1].max()
    prop = model.prop
    prop["emod"][:] = 3e4
    prop["rho"][:] = 1.0
    prop["eta"][:] = 2.0
    prop["nu"][:] = 0.45
    prop["ycontact"][:] = ymax + 0.01
    prop["kcontact"][:] = 1e8
    prop["rho_air"][:] = 1.1225e-3
    prop["r_sep"][:] = 1.0
    prop["area_lb"][:] = 1e-4
    prop["ymid"][:] = ymax + 0.01
    prop["area"][:] = vowel_a_area(n_tube)
    prop["proploss"][:] = 1.0
    model.set_prop(prop)
    model.control["psub"][:] = 8000.0
    model.set_control(model.control)
    return model


def vowel_a_area(n_tube):
    """Crude /a/ area function: narrow pharynx, wide mouth (cm^2)."""
    area = np.full(n_tube, 1.3)
    area[n_tube // 2:] = 6.0
    return area


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seconds", type=float, default=0.12)
    parser.add_argument("--wav", default="/tmp/voice.wav")
    parser.add_argument("--n-tube", type=int, default=44)
    args = parser.parse_args()

    # ONE two-way coupled FSAI integrate at the tract's locked dt
    model = build_fsai(args.n_tube)
    dt = model.dt
    n_steps = int(args.seconds / dt)
    fs = 1.0 / dt
    print(f"dt = {dt * 1e6:.1f} us (fs = {fs:.0f} Hz), {n_steps} steps")

    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = dt * np.arange(n_steps + 1)
    tol = {
        "jacobian_update": "once_per_step",
        "stagnation_ratio": 0.5,
        "jacobian_refresh_steps": 25,
        "jacobian_refresh_mode": "ns",
        "jacobian_full_refresh_windows": 4,
        "fixed_iterations": 2,
    }
    t0 = time.perf_counter()
    fin, traj, infos = forward._integrate_windowed(
        model, state0, cs, pd, times, tol, window=1000
    )
    q = np.asarray(traj["q"]).reshape(n_steps, -1)[:, 0]
    print(f"coupled FSAI: {n_steps} steps in"
          f" {time.perf_counter() - t0:.1f} s; q in"
          f" [{q.min():.1f}, {q.max():.1f}] cm^3/s")
    prad = (np.asarray(traj["pinc"])[:, -1]
            + np.asarray(traj["pref"])[:, -1])

    # report f0 + formants from the steady portion
    steady = prad[n_steps // 3:]
    f0, _ = fundamental_mode_from_rfft(
        np.asarray(q[n_steps // 3:], dtype=float), dt
    )
    spec = np.abs(np.fft.rfft(steady * np.hanning(len(steady))))
    freqs = np.fft.rfftfreq(len(steady), dt)
    # formants: peaks of the smoothed log envelope above f0
    env = np.convolve(np.log(spec + 1e-12), np.ones(9) / 9, mode="same")
    peaks = [
        int(i) for i in range(2, len(env) - 2)
        if env[i] > env[i - 1] and env[i] > env[i + 1]
        and freqs[i] > 1.5 * f0 and freqs[i] < 5000
    ]
    peaks = sorted(peaks, key=lambda i: -env[i])[:3]
    formants = sorted(float(freqs[i]) for i in peaks)
    print(f"f0 = {f0:.1f} Hz; formant peaks ~ "
          + ", ".join(f"{f:.0f}" for f in formants) + " Hz")

    # 4. write WAV (16-bit mono at the simulation rate)
    x = steady - steady.mean()
    x = (x / (np.abs(x).max() + 1e-30) * 32000).astype(np.int16)
    with wave.open(args.wav, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(round(fs)))
        w.writeframes(x.tobytes())
    print(f"wrote {args.wav}: {len(x)} samples at {fs:.0f} Hz")


if __name__ == "__main__":
    main()
