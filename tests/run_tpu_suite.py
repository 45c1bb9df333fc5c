"""Run the test suite on the real TPU chip.

TPU analogue of the reference's device sweep (`test/test_cuda.py:24-40`,
which re-executes the discovered suite with `device=cuda`), as SURVEY §4
prescribes. The normal suite (`python -m pytest tests/`) pins an
8-virtual-device CPU mesh via `tests/conftest.py` to exercise sharding
logic without a pod; THIS entry point bypasses that conftest so jax
initializes its default backend (the TPU plugin), un-skipping every
`skipif(jax.default_backend() != "tpu")` test.

Usage (from anywhere):

    python tests/run_tpu_suite.py            # TPU-gated kernel tests only
    python tests/run_tpu_suite.py --full     # the whole suite on the chip
    python tests/run_tpu_suite.py tests/test_gp.py   # a specific target

Environment handling this script gets right so you don't have to:
  * PYTHONPATH: the TPU plugin's site dir (e.g. `/root/.axon_site`) must
    stay on the path — this script APPENDS the repo root instead of
    replacing PYTHONPATH.
  * output capture: pytest's fd-level capture can deadlock against the
    TPU runtime's own stdout writers — we force `-s`.
  * first-compile latency: Pallas kernels at the n=64 cap take ~2-3 min
    to compile; the TPU-gated set runs in ~10 min cold.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Tests whose TPU-gated paths are the point: the Pallas kernels and the
# fused linalg op (the MLL/NUTS gradient path). Everything else also
# RUNS on TPU via --full, but these are the required-green set.
TPU_GATED = [
    "tests/test_pallas_kernels.py",
    "tests/test_pallas_linalg.py",
    # software-f64 on the chip (r4: the x64 opt-in target actually runs)
    "tests/test_x64.py::test_x64_software_f64_on_chip",
    # SAASBO closed-loop regret vs the measured CPU-replica bar (r5)
    "tests/test_saasbo_loop.py::test_saasbo_regret_bar_on_chip",
]


def main(argv: list[str]) -> int:
    env = dict(os.environ)
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    if REPO not in parts:
        parts.append(REPO)
    env["PYTHONPATH"] = os.pathsep.join(parts)
    # Never inherit the suite's CPU pin.
    env.pop("JAX_PLATFORMS", None) if env.get(
        "JAX_PLATFORMS"
    ) == "cpu" else None

    # Persistent XLA compilation cache (r4 verdict item 5): repeated
    # sweeps of the same files skip the 20-40 s (2-3 min for the n=64
    # Pallas kernel) recompiles, which dominate on-chip suite wall-clock.
    cache_dir = env.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    args = [a for a in argv if a != "--full"]
    full = "--full" in argv
    targets = args or (["tests"] if full else TPU_GATED)
    cmd = [
        sys.executable,
        "-m",
        "pytest",
        "--noconftest",
        "-q",
        "-s",
        "-p",
        "no:cacheprovider",
        *targets,
    ]
    print("+", " ".join(cmd), flush=True)
    return subprocess.call(cmd, env=env, cwd=REPO)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
