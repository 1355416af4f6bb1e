"""Analytic gate/obstacle geometry for the competition maze.

The reference resolves gate passing and collisions through PyBullet queries
on URDF bodies (quadrotor.py:1046-1112 — ``p.getContactPoints`` on
obstacle/gate/plane bodies, a 7-ray ``p.rayTestBatch`` fan across the gate
aperture, ``p.getClosestPoints`` for the 0.45 m visibility range).  Here those
queries become closed-form batched geometry over all gates/obstacles at once,
derived from the same URDF dimensions:

  * gate (portal.urdf / low_portal.urdf): square frame of 0.5x0.05x0.05 bars
    centered at +/-0.225 around the aperture (inner half-width 0.2, outer
    0.25), frame slab thickness 0.05, aperture center at height 1.0 (tall,
    type 0) or 0.525 (low, type 1); support leg below the frame.
  * obstacle (obstacle.urdf): vertical cylinder, radius 0.05, height 1.05
    (dimensions as published to controllers in reset info,
    quadrotor.py:1176-1180).
  * the drone is approximated by a sphere of radius ``DRONE_RADIUS``
    (cf2x.urdf collision cylinder radius 0.06).

Gate-passing reproduces the reference's ray-fan test: 7 vertical segments at
lateral offsets i*0.05 m (i in -3..3) along the gate's in-plane axis, spanning
height +/- 0.1875 m (quadrotor.py:1068-1092); "passed" means the drone sphere
intersects any segment.
"""

from __future__ import annotations

import jax.numpy as jnp

DRONE_RADIUS = 0.06
GATE_HEIGHTS = (1.0, 0.525)  # by type: 0 = tall portal, 1 = low portal
RAY_HALF_LENGTH = 0.1875  # quadrotor.py:1068
RAY_SPACING = 0.05  # quadrotor.py:1069-1070
N_RAY_OFFSETS = 3
VISIBILITY_RANGE = 0.45  # quadrotor.py:1094
GATE_INNER_HALF = 0.2  # aperture half-width (bars at 0.225 +/- 0.025)
GATE_OUTER_HALF = 0.25
GATE_SLAB_HALF = 0.025  # frame thickness / 2
OBSTACLE_RADIUS = 0.05
OBSTACLE_HEIGHT = 1.05
# Ground contact when the cf2x collision cylinder's bottom face reaches the
# plane (cylinder length 0.025 centered at the base link origin).
GROUND_COLLISION_Z = 0.0125


def _point_vertical_segment_dist(p, seg_xy, z_lo, z_hi):
    """Distance from points p (..., 3) to vertical segments.

    seg_xy: (..., 2); z range [z_lo, z_hi] broadcastable.
    """
    dxy = p[..., :2] - seg_xy
    dz = jnp.clip(p[..., 2], z_lo, z_hi) - p[..., 2]
    return jnp.sqrt(jnp.sum(dxy * dxy, -1) + dz * dz)


def gate_pass_hit(pos, gate_xy, gate_yaw, gate_height, drone_radius=DRONE_RADIUS):
    """Does the drone sphere intersect the gate's 7-ray fan?

    pos: (3,); gate_xy: (NG, 2); gate_yaw: (NG,); gate_height: (NG,).
    Returns (NG,) bool.
    """
    offsets = jnp.arange(-N_RAY_OFFSETS, N_RAY_OFFSETS + 1, dtype=pos.dtype) * RAY_SPACING
    # Ray lateral direction: (cos yaw, sin yaw) (quadrotor.py:1069-1070).
    d = jnp.stack([jnp.cos(gate_yaw), jnp.sin(gate_yaw)], -1)  # (NG, 2)
    seg_xy = gate_xy[:, None, :] + offsets[None, :, None] * d[:, None, :]  # (NG, 7, 2)
    z_lo = (gate_height - RAY_HALF_LENGTH)[:, None]
    z_hi = (gate_height + RAY_HALF_LENGTH)[:, None]
    dist = _point_vertical_segment_dist(pos[None, None, :], seg_xy, z_lo, z_hi)
    return jnp.any(dist < drone_radius, axis=-1)


def gate_in_range(pos, gate_xy, gate_height, rng=VISIBILITY_RANGE):
    """Closest-point visibility test (quadrotor.py:1096-1106), approximated by
    distance from the drone to the gate frame center region."""
    center = jnp.concatenate([gate_xy, gate_height[:, None]], -1)
    # Distance to the frame square (outer box of half extent GATE_OUTER_HALF
    # in-plane, slab thickness along the normal) approximated by distance to
    # center minus the frame's circumscribed radius.
    d = jnp.linalg.norm(pos[None, :] - center, axis=-1)
    return d < (rng + GATE_OUTER_HALF + GATE_SLAB_HALF)


def gate_collision(pos, gate_xy, gate_yaw, gate_height, drone_radius=DRONE_RADIUS):
    """Drone sphere vs. gate frame + support. Returns (NG,) bool."""
    rel = pos[None, :2] - gate_xy  # (NG, 2)
    c, s = jnp.cos(gate_yaw), jnp.sin(gate_yaw)
    # Gate in-plane lateral axis u = (cos, sin); normal n = (-sin, cos).
    u = rel[:, 0] * c + rel[:, 1] * s
    n = -rel[:, 0] * s + rel[:, 1] * c
    w = pos[2] - gate_height  # height above aperture center
    in_slab = jnp.abs(n) < (GATE_SLAB_HALF + drone_radius)
    in_outer = (jnp.abs(u) < GATE_OUTER_HALF + drone_radius) & (
        jnp.abs(w) < GATE_OUTER_HALF + drone_radius
    )
    in_inner = (jnp.abs(u) < GATE_INNER_HALF - drone_radius) & (
        jnp.abs(w) < GATE_INNER_HALF - drone_radius
    )
    frame_hit = in_slab & in_outer & ~in_inner
    # Support leg: vertical cylinder r=0.05 from ground to frame bottom.
    leg = (jnp.sqrt(rel[:, 0] ** 2 + rel[:, 1] ** 2) < OBSTACLE_RADIUS + drone_radius) & (
        pos[2] < gate_height - GATE_OUTER_HALF
    )
    return frame_hit | leg


def gate_frame_margin(pos, gate_xy, gate_yaw, gate_height, drone_radius=DRONE_RADIUS):
    """Signed clearance margin (m) of the drone sphere to each gate frame.

    Continuous companion of ``gate_collision`` for diagnosis/robustness
    sweeps: the frame is hit exactly when all three box conditions hold, so
    the margin is the max of the three signed violations — positive means
    safe, and its magnitude says how much slack (or penetration) the binding
    condition has.  Axes as in ``gate_collision``: u = in-plane lateral,
    n = gate normal, w = height above the aperture center.
    Returns (NG,) f32.
    """
    rel = pos[None, :2] - gate_xy
    c, s = jnp.cos(gate_yaw), jnp.sin(gate_yaw)
    u = rel[:, 0] * c + rel[:, 1] * s
    n = -rel[:, 0] * s + rel[:, 1] * c
    w = pos[2] - gate_height
    uw = jnp.maximum(jnp.abs(u), jnp.abs(w))
    f_slab = jnp.abs(n) - (GATE_SLAB_HALF + drone_radius)
    f_outer = uw - (GATE_OUTER_HALF + drone_radius)
    f_inner = (GATE_INNER_HALF - drone_radius) - uw
    frame_m = jnp.maximum(jnp.maximum(f_slab, f_outer), f_inner)
    # Support leg margin: radial distance minus radii, unless above the leg.
    leg_m = jnp.maximum(
        jnp.sqrt(rel[:, 0] ** 2 + rel[:, 1] ** 2) - (OBSTACLE_RADIUS + drone_radius),
        pos[2] - (gate_height - GATE_OUTER_HALF),
    )
    return jnp.minimum(frame_m, leg_m)


def obstacle_margin(pos, obs_xy, drone_radius=DRONE_RADIUS):
    """Signed clearance margin (m) to each obstacle cylinder. (NO,) f32."""
    rel = pos[None, :2] - obs_xy
    radial = jnp.sqrt(jnp.sum(rel * rel, -1)) - (OBSTACLE_RADIUS + drone_radius)
    above = pos[2] - (OBSTACLE_HEIGHT + drone_radius)
    return jnp.maximum(radial, above)


def obstacle_collision(pos, obs_xy, drone_radius=DRONE_RADIUS):
    """Drone sphere vs. obstacle cylinders. Returns (NO,) bool."""
    rel = pos[None, :2] - obs_xy
    radial = jnp.sqrt(jnp.sum(rel * rel, -1)) < (OBSTACLE_RADIUS + drone_radius)
    in_z = pos[2] < OBSTACLE_HEIGHT + drone_radius
    return radial & in_z


def ground_collision(pos):
    return pos[2] < GROUND_COLLISION_Z
