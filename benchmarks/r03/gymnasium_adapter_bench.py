"""GymnasiumVectorEnv vs gymnasium's SyncVectorEnv: vector-API throughput.

Both sides implement the same `gymnasium.vector.VectorEnv` protocol on a
4-state Euler cart-pole at dt = 0.02 (`CartPole-v1` vs this engine's
`CartPole`; dynamics differ in friction terms and continuous-vs-discrete
action, so this compares the *API machinery* — host loop over sub-envs vs
one jitted on-device program — not the physics kernels).

Run on the host CPU backend:

    env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python \
        benchmarks/r03/gymnasium_adapter_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import numpy as np

# the axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon, so setting env vars here would be inert — pin the true
# local CPU through the live config instead (see CLAUDE.md / conftest.py)
jax.config.update("jax_platforms", "cpu")


def time_steps(venv, actions, n_steps):
    venv.reset(seed=0)
    venv.step(actions)  # warm-up / compile
    t0 = time.perf_counter()
    for _ in range(n_steps):
        venv.step(actions)
    return n_steps * venv.num_envs / (time.perf_counter() - t0)


def main():
    import gymnasium

    import exciting_environments_tpu as excenvs

    n_steps = 200
    for B in (128, 1024, 8192):
        ours = excenvs.GymnasiumVectorEnv(
            excenvs.CartPole(batch_size=B, tau=2e-2), max_episode_steps=500
        )
        ours_sps = time_steps(ours, np.zeros((B, 1), np.float32), n_steps)

        sync_sps = None
        if B <= 1024:  # SyncVectorEnv construction/stepping is prohibitive above
            sync = gymnasium.vector.SyncVectorEnv(
                [lambda: gymnasium.make("CartPole-v1") for _ in range(B)]
            )
            sync_sps = time_steps(sync, np.zeros(B, np.int64), n_steps)
            sync.close()

        print(json.dumps({
            "metric": f"gymnasium_vector_step_B{B}",
            "ours_env_steps_per_s": ours_sps,
            "sync_vector_env_steps_per_s": sync_sps,
            "speedup": None if sync_sps is None else ours_sps / sync_sps,
            "n_steps": n_steps,
        }), flush=True)


if __name__ == "__main__":
    main()
