"""Transform/camera math matching the reference's glm conventions.

Conventions (verified against the reference):
  * model matrix = T · Rx · Ry · Rz · S, euler angles in DEGREES
    (Trident-Forge ComposeTransform; glm::translate/rotate x,y,z/scale)
  * projection  = glm::perspectiveRH_ZO / orthoRH_ZO (depth in [0,1]) with
    the Vulkan Y-flip `proj[1][1] *= -1` (EditorCamera.cpp:140-160)
  * view        = glm::lookAtRH
  * normal matrix = transpose(inverse(mat3(model)))  (Default.vert)

Matrices are row-major arrays multiplying COLUMN vectors: clip = P@V@M@p.
Functions are batched: leading dimensions broadcast, so a (N,3) translation
yields (N,4,4). They work on both numpy and jax arrays (the ops used exist
in both namespaces); host scene code passes numpy, jitted code passes jnp.
"""

from __future__ import annotations

import numpy as np

try:  # dispatch on input type so these helpers trace under jit
    import jax
    import jax.numpy as jnp

    def _xp(*arrays):
        return jnp if any(isinstance(a, jax.Array) for a in arrays) else np
except ImportError:  # pragma: no cover
    def _xp(*arrays):
        return np


def _eye4(xp, batch_shape, dtype):
    eye = xp.eye(4, dtype=dtype)
    if batch_shape:
        eye = xp.broadcast_to(eye, (*batch_shape, 4, 4))
    return eye


def rotate_x(angle_rad):
    xp = _xp(angle_rad)
    angle_rad = xp.asarray(angle_rad, dtype=xp.float32)
    c, s = xp.cos(angle_rad), xp.sin(angle_rad)
    z, o = xp.zeros_like(c), xp.ones_like(c)
    rows = [
        xp.stack([o, z, z, z], axis=-1),
        xp.stack([z, c, -s, z], axis=-1),
        xp.stack([z, s, c, z], axis=-1),
        xp.stack([z, z, z, o], axis=-1),
    ]
    return xp.stack(rows, axis=-2)


def rotate_y(angle_rad):
    xp = _xp(angle_rad)
    angle_rad = xp.asarray(angle_rad, dtype=xp.float32)
    c, s = xp.cos(angle_rad), xp.sin(angle_rad)
    z, o = xp.zeros_like(c), xp.ones_like(c)
    rows = [
        xp.stack([c, z, s, z], axis=-1),
        xp.stack([z, o, z, z], axis=-1),
        xp.stack([-s, z, c, z], axis=-1),
        xp.stack([z, z, z, o], axis=-1),
    ]
    return xp.stack(rows, axis=-2)


def rotate_z(angle_rad):
    xp = _xp(angle_rad)
    angle_rad = xp.asarray(angle_rad, dtype=xp.float32)
    c, s = xp.cos(angle_rad), xp.sin(angle_rad)
    z, o = xp.zeros_like(c), xp.ones_like(c)
    rows = [
        xp.stack([c, -s, z, z], axis=-1),
        xp.stack([s, c, z, z], axis=-1),
        xp.stack([z, z, o, z], axis=-1),
        xp.stack([z, z, z, o], axis=-1),
    ]
    return xp.stack(rows, axis=-2)


def euler_deg_to_mat3(euler_deg):
    """Rx·Ry·Rz rotation from degrees, matching the reference's compose order."""
    xp = _xp(euler_deg)
    e = xp.radians(xp.asarray(euler_deg, dtype=xp.float32))
    r = rotate_x(e[..., 0]) @ rotate_y(e[..., 1]) @ rotate_z(e[..., 2])
    return r[..., :3, :3]


def compose_trs(translation, rotation_euler_deg, scale):
    """T · Rx · Ry · Rz · S → (...,4,4). Batched over leading dims."""
    xp = _xp(translation, rotation_euler_deg, scale)
    t = xp.asarray(translation, dtype=xp.float32)
    s = xp.asarray(scale, dtype=xp.float32)
    rot3 = euler_deg_to_mat3(rotation_euler_deg)
    m3 = rot3 * s[..., None, :]  # R @ diag(s): scale the columns
    batch = t.shape[:-1]
    m = _eye4(xp, batch, xp.float32)
    if hasattr(m, "at"):  # jax
        m = m.at[..., :3, :3].set(m3)
        m = m.at[..., :3, 3].set(t)
    else:
        m = np.array(m)
        m[..., :3, :3] = m3
        m[..., :3, 3] = t
    return m


def decompose_trs(matrix):
    """Best-effort inverse of compose_trs: (translation, euler_deg, scale).
    Follows the reference's DecomposeWorldTransform semantics (column norms
    for scale, XYZ euler extraction). Host-side only (numpy)."""
    m = np.asarray(matrix, dtype=np.float32)
    t = m[:3, 3].copy()
    scale = np.linalg.norm(m[:3, :3], axis=0)
    scale = np.where(scale < 1e-8, 1.0, scale)
    r = m[:3, :3] / scale[None, :]
    # R = Rx(x)·Ry(y)·Rz(z): r[0,2]=sin(y); see rotate_* definitions.
    sy = np.clip(r[0, 2], -1.0, 1.0)
    y = np.arcsin(sy)
    if abs(sy) < 0.99999:
        x = np.arctan2(-r[1, 2], r[2, 2])
        z = np.arctan2(-r[0, 1], r[0, 0])
    else:  # gimbal lock
        x = np.arctan2(r[2, 1], r[1, 1])
        z = 0.0
    return t, np.degrees(np.array([x, y, z], dtype=np.float32)), scale


def look_at(eye, center, up):
    """glm::lookAtRH."""
    xp = _xp(eye, center, up)
    eye = xp.asarray(eye, dtype=xp.float32)
    center = xp.asarray(center, dtype=xp.float32)
    up = xp.asarray(up, dtype=xp.float32)
    f = center - eye
    f = f / xp.linalg.norm(f, axis=-1, keepdims=True)
    s = xp.cross(f, up)
    s = s / xp.linalg.norm(s, axis=-1, keepdims=True)
    u = xp.cross(s, f)
    row0 = xp.concatenate([s, -xp.sum(s * eye, axis=-1, keepdims=True)], axis=-1)
    row1 = xp.concatenate([u, -xp.sum(u * eye, axis=-1, keepdims=True)], axis=-1)
    row2 = xp.concatenate([-f, xp.sum(f * eye, axis=-1, keepdims=True)], axis=-1)
    row3 = xp.broadcast_to(xp.asarray([0.0, 0.0, 0.0, 1.0], dtype=xp.float32), row0.shape)
    return xp.stack([row0, row1, row2, row3], axis=-2)


def perspective_rh_zo(fov_y_deg, aspect, near, far, flip_y: bool = True):
    """glm::perspectiveRH_ZO (+ Vulkan Y-flip by default)."""
    xp = _xp(fov_y_deg, aspect)
    fov = xp.radians(xp.asarray(fov_y_deg, dtype=xp.float32))
    tan_half = xp.tan(fov / 2.0)
    m = np.zeros((4, 4), dtype=np.float32) if xp is np else jnp.zeros((4, 4), jnp.float32)
    e00 = 1.0 / (aspect * tan_half)
    e11 = (-1.0 if flip_y else 1.0) / tan_half
    e22 = far / (near - far)
    e23 = -(far * near) / (far - near)
    if hasattr(m, "at"):
        m = m.at[0, 0].set(e00).at[1, 1].set(e11).at[2, 2].set(e22)
        m = m.at[2, 3].set(e23).at[3, 2].set(-1.0)
    else:
        m[0, 0], m[1, 1], m[2, 2], m[2, 3], m[3, 2] = e00, e11, e22, e23, -1.0
    return m


def ortho_rh_zo(left, right, bottom, top, near, far, flip_y: bool = True):
    """glm::orthoRH_ZO (+ Vulkan Y-flip by default)."""
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = 2.0 / (right - left)
    m[1, 1] = 2.0 / (top - bottom) * (-1.0 if flip_y else 1.0)
    m[2, 2] = -1.0 / (far - near)
    m[0, 3] = -(right + left) / (right - left)
    m[1, 3] = -(top + bottom) / (top - bottom)
    m[2, 3] = -near / (far - near)
    m[3, 3] = 1.0
    return m


def vulkan_flip_y(proj):
    """Apply `proj[1][1] *= -1` to a projection built without the flip."""
    xp = _xp(proj)
    if hasattr(proj, "at"):
        return proj.at[..., 1, 1].multiply(-1.0)
    proj = np.array(proj)
    proj[..., 1, 1] *= -1.0
    return proj


def normal_matrix(model):
    """transpose(inverse(mat3(model))) — batched."""
    xp = _xp(model)
    m3 = xp.asarray(model)[..., :3, :3]
    inv = xp.linalg.inv(m3)
    return xp.swapaxes(inv, -1, -2)
