"""Rotation/aim math.

The reference stores an Aim{yaw, pitch, quat} (reference src/types.hpp:455-459,
computeAim in src/utils.cpp:140-167). On TPU we avoid quaternions entirely:
every use of the aim quat is a rotate of a basis vector, so we compute the
rotated basis (fwd/right/up) directly from yaw/pitch trig — fewer flops and
no normalization.

Conventions (madrona): fwd = +y, right = +x, up = +z.
aim rot = Rz(yaw) @ Rx(pitch).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import consts


def wrap_pi(angle):
    """One-shot wrap into [-pi, pi] (matches computeAim, utils.cpp:142-146).

    Note: intentionally a single conditional add, not a modulo, mirroring the
    reference for trajectory comparability (per-step deltas are << 2*pi).
    """
    angle = jnp.where(angle < -consts.pi, angle + 2.0 * consts.pi, angle)
    angle = jnp.where(angle > consts.pi, angle - 2.0 * consts.pi, angle)
    return angle


def compute_aim(yaw, pitch):
    """Wrap yaw, clamp pitch to +-pi/4 (utils.cpp:140-155)."""
    yaw = wrap_pi(yaw)
    pitch = jnp.clip(pitch, -0.25 * consts.pi, 0.25 * consts.pi)
    return yaw, pitch


def aim_vectors(yaw, pitch):
    """Return (fwd, right, up) unit vectors of the aim frame.

    fwd   = Rz(yaw) Rx(pitch) (0,1,0) = (-sin(yaw)cos(p), cos(yaw)cos(p), sin(p))
    right = Rz(yaw) Rx(pitch) (1,0,0) = (cos(yaw), sin(yaw), 0)
    up    = Rz(yaw) Rx(pitch) (0,0,1) = (sin(yaw)sin(p), -cos(yaw)sin(p), cos(p))
    """
    sy, cy = jnp.sin(yaw), jnp.cos(yaw)
    sp, cp = jnp.sin(pitch), jnp.cos(pitch)
    fwd = jnp.stack([-sy * cp, cy * cp, sp], axis=-1)
    right = jnp.stack([cy, sy, jnp.zeros_like(cy)], axis=-1)
    up = jnp.stack([sy * sp, -cy * sp, cp], axis=-1)
    return fwd, right, up


def body_fwd_right(yaw):
    """Rotation component is yaw-only (Quat::angleAxis(yaw, up), sim.cpp:2281)."""
    sy, cy = jnp.sin(yaw), jnp.cos(yaw)
    fwd = jnp.stack([-sy, cy, jnp.zeros_like(sy)], axis=-1)
    right = jnp.stack([cy, sy, jnp.zeros_like(sy)], axis=-1)
    return fwd, right


def to_view_space(v, yaw, pitch):
    """aim.rot.inv().rotateVec(v): components of v in the aim frame."""
    fwd, right, up = aim_vectors(yaw, pitch)
    x = jnp.einsum("...i,...i->...", v, right)
    y = jnp.einsum("...i,...i->...", v, fwd)
    z = jnp.einsum("...i,...i->...", v, up)
    return jnp.stack([x, y, z], axis=-1)


def rotate_z(v, angle):
    """Rotate vector(s) about +z by angle (Rotate2D keeps z=0 in reference;
    here we preserve z which matches Quat::angleAxis(angle, up) semantics)."""
    s, c = jnp.sin(angle), jnp.cos(angle)
    x = c * v[..., 0] - s * v[..., 1]
    y = s * v[..., 0] + c * v[..., 1]
    z = jnp.broadcast_to(v[..., 2], x.shape)
    return jnp.stack([x, y, z], axis=-1)


def yaw_pitch_to(vec):
    """Direction vector -> (yaw, pitch) matching the reference's convention
    new_yaw = -atan2(x, y), new_pitch = asin(clamp(z,-1,1)) (sim.cpp:2968-2969).
    `vec` must be normalized."""
    yaw = -jnp.arctan2(vec[..., 0], vec[..., 1])
    pitch = jnp.arcsin(jnp.clip(vec[..., 2], -1.0, 1.0))
    return yaw, pitch


def normalize(v, eps=0.0):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.where(n > eps, v / jnp.maximum(n, 1e-30), jnp.zeros_like(v))
