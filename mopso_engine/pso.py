"""PSO velocity/position updates (SURVEY F4-F8) — vectorized numpy.

The swarm is control state: (S, k, d) arrays on the driver, exactly as
the reference holds it (Spark_MOPSO_Avg.scala:128-136). One seeded
``np.random.Generator`` per fit() gives self-determinism (SURVEY §7.4.2:
we promise statistical, not bitwise, parity with Scala's Random).

Update rule (Spark_MOPSO_Avg.scala:497-540):
    v' = w·v + c1·U()·(pbest − x) + c2·U()·(gbest − x)   (fresh U per cell)
    if v' ∉ [Vmin, Vmax]: v' = U()·(Vmax−Vmin) + Vmin    (RESAMPLE, not clip)
    x' = x + v'
The Particle variant omits the velocity resample
(Spark_MOPSO_Particle.scala:586-589); Single additionally resamples
out-of-bound positions per feature (MOPSO_Single.scala:445-449).
"""

from __future__ import annotations

import numpy as np

from mopso_engine.schema import MopsoConfig


def init_velocity(rng: np.random.Generator, shape: tuple[int, ...], v_min: float, v_max: float) -> np.ndarray:
    """Uniform in [Vmin, Vmax] (Spark_MOPSO_Avg.scala:130)."""
    return rng.uniform(v_min, v_max, size=shape)


def update_swarm(
    positions: np.ndarray,  # (S, k, d)
    velocities: np.ndarray,  # (S, k, d)
    pbest_positions: np.ndarray,  # (S, k, d)
    gbest_position: np.ndarray,  # (k, d)
    w: float,
    cfg: MopsoConfig,
    rng: np.random.Generator,
    feature_bounds: np.ndarray | None = None,  # (d, 2) [min, max] per feature
) -> tuple[np.ndarray, np.ndarray]:
    """One PSO step for the whole swarm. Returns (positions', velocities')."""
    shape = positions.shape
    r1 = rng.random(shape)
    r2 = rng.random(shape)
    v = (
        w * velocities
        + cfg.c1 * r1 * (pbest_positions - positions)
        + cfg.c2 * r2 * (gbest_position[None, :, :] - positions)
    )
    if cfg.velocity_resample:
        bad = (v > cfg.v_max) | (v < cfg.v_min)
        if bad.any():
            v = np.where(bad, rng.uniform(cfg.v_min, cfg.v_max, size=shape), v)
    x = positions + v
    if cfg.position_bounds:
        if feature_bounds is None:
            raise ValueError("position_bounds=True requires feature_bounds")
        lo = feature_bounds[:, 0][None, None, :]
        hi = feature_bounds[:, 1][None, None, :]
        bad = (x < lo) | (x > hi)
        if bad.any():
            resampled = rng.uniform(np.broadcast_to(lo, shape), np.broadcast_to(hi, shape))
            x = np.where(bad, resampled, x)
    return x, v


def canonicalize_centers(centers: np.ndarray) -> np.ndarray:
    """Sort centers ascending by first coordinate — the reference's
    canonical solution order (O3, Spark_MOPSO_Avg.scala:1113,1186)."""
    return centers[np.argsort(centers[:, 0], kind="stable")]
