# scratch: magsac vs inlier A/B numbers (delete before commit)
import os

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from far_tpu.geometry import geodesic_distance
from far_tpu.solvers import RansacConfig, prior_ransac
from tests.test_ransac import make_scene

rng = np.random.default_rng(0)
for noise, thr in [(1e-3, 1e-4), (2e-3, 3e-4), (3e-3, 1e-3)]:
    scenes = [make_scene(rng, noise=noise) for _ in range(24)]
    kp1 = jnp.stack([jnp.asarray(s[2]) for s in scenes])
    kp2 = jnp.stack([jnp.asarray(s[3]) for s in scenes])
    valid = jnp.stack([jnp.asarray(s[4]) for s in scenes])
    base = RansacConfig(num_hypotheses=1024, inl_th=thr, polish=False)

    def errs_of(cfg, seed=5):
        est = prior_ransac(jax.random.PRNGKey(seed), kp1, kp2, valid,
                           cfg=cfg)
        r = [np.degrees(float(geodesic_distance(
            est.R[b], jnp.asarray(s[0], jnp.float32))))
            for b, s in enumerate(scenes)]
        t = [np.degrees(np.arccos(np.clip(abs(float(
            np.dot(np.asarray(est.t[b]), s[1]))), 0, 1)))
            for b, s in enumerate(scenes)]
        return float(np.median(r)), float(np.median(t))

    p = errs_of(base)
    m = errs_of(dataclasses.replace(base, scoring="magsac"))
    print(f"noise={noise} thr={thr}: plain R/t {p[0]:.3f}/{p[1]:.3f}  "
          f"magsac R/t {m[0]:.3f}/{m[1]:.3f}")
