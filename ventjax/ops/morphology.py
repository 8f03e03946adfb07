"""Binary mask morphology: the reference's "edit mask" roadmap item
(/root/reference/README.md:28) implemented as jittable device ops.

Lung masks are hand-drawn per slice in the reference workflow, so the ops
default to slice-wise 2-D structuring elements (each [H,W] slice edited
independently, like the per-slice medfilt2d at Vent_Analysis.py:249);
``slicewise=False`` switches to the full 3-D neighborhood.

All ops take float/bool [H,W,D] volumes, return float32 0/1 volumes, and
run under jit/vmap (fixed-trip loops only).  Border semantics match
scipy.ndimage's defaults (outside the volume is background, so masks
touching the border erode from it); ground truth for tests is
scipy.ndimage (tests/test_ops.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _dilate_once(m: jnp.ndarray, slicewise: bool, connectivity: int,
                 pad_value: float = 0.0) -> jnp.ndarray:
    """One max-dilation step with an explicit out-of-volume value.

    connectivity 1 = cross element (scipy's default structure: 4-neighbor
    per slice, 6-neighbor in 3-D); connectivity 2 = the full 3x3(x3) box.
    """
    def axis_max(x, axis):
        pad = [(0, 0)] * 3
        pad[axis] = (1, 1)
        xp = jnp.pad(x, pad, constant_values=pad_value)
        dims = [1, 1, 1]
        dims[axis] = 3
        return jax.lax.reduce_window(
            xp, -jnp.inf, jax.lax.max, tuple(dims), (1, 1, 1), "VALID")

    if connectivity == 1:
        out = jnp.maximum(axis_max(m, 0), axis_max(m, 1))
        if not slicewise:
            out = jnp.maximum(out, axis_max(m, 2))
        return out
    pads = [(1, 1), (1, 1), (0, 0) if slicewise else (1, 1)]
    mp = jnp.pad(m, pads, constant_values=pad_value)
    dims = (3, 3, 1) if slicewise else (3, 3, 3)
    return jax.lax.reduce_window(
        mp, -jnp.inf, jax.lax.max, dims, (1, 1, 1), "VALID")


def binary_dilate(mask: jnp.ndarray, iters: int = 1, *,
                  slicewise: bool = True,
                  connectivity: int = 1) -> jnp.ndarray:
    """Grow the mask by `iters` structuring-element steps."""
    m = (jnp.asarray(mask) > 0).astype(jnp.float32)
    for _ in range(int(iters)):
        m = _dilate_once(m, slicewise, connectivity, pad_value=0.0)
    return (m > 0).astype(jnp.float32)


def binary_erode(mask: jnp.ndarray, iters: int = 1, *,
                 slicewise: bool = True,
                 connectivity: int = 1) -> jnp.ndarray:
    """Shrink the mask: erosion = complement of dilating the complement.

    The complement is padded with 1 (outside the volume is background), so
    border-touching masks erode from the border — scipy's border_value=0.
    """
    m = (jnp.asarray(mask) > 0).astype(jnp.float32)
    inv = 1.0 - m
    for _ in range(int(iters)):
        inv = _dilate_once(inv, slicewise, connectivity, pad_value=1.0)
    return (inv == 0).astype(jnp.float32)


def binary_open(mask: jnp.ndarray, iters: int = 1, **kw) -> jnp.ndarray:
    """Erode then dilate: removes islands/spurs smaller than the element."""
    return binary_dilate(binary_erode(mask, iters, **kw), iters, **kw)


def binary_close(mask: jnp.ndarray, iters: int = 1, **kw) -> jnp.ndarray:
    """Dilate then erode: closes gaps/channels smaller than the element."""
    return binary_erode(binary_dilate(mask, iters, **kw), iters, **kw)


@functools.partial(jax.jit, static_argnames=("slicewise",))
def fill_holes(mask: jnp.ndarray, *, slicewise: bool = True) -> jnp.ndarray:
    """Fill enclosed background regions (scipy binary_fill_holes semantics).

    Geodesic reconstruction: flood the background from the volume border
    (cross connectivity, scipy's default structure) by repeated
    dilate-and-clip; background the flood cannot reach is a hole.  The
    flood runs to its FIXPOINT under lax.while_loop — a fixed H+W(+D)
    trip count is not enough: the worst-case geodesic distance through a
    winding corridor is O(H*W), and an under-iterated flood misclassifies
    border-connected background as holes (found by review: a spiral
    corridor open only at the border filled 64 voxels that scipy leaves).
    """
    m = (jnp.asarray(mask) > 0).astype(jnp.float32)
    H, W, D = m.shape
    outside = 1.0 - m
    ii = jnp.arange(H)[:, None, None]
    jj = jnp.arange(W)[None, :, None]
    kk = jnp.arange(D)[None, None, :]
    border = (ii == 0) | (ii == H - 1) | (jj == 0) | (jj == W - 1)
    if not slicewise:
        border = border | (kk == 0) | (kk == D - 1)
    seed = outside * border.astype(jnp.float32)

    def cond(carry):
        return carry[1]

    def body(carry):
        s, _ = carry
        ns = jnp.minimum(_dilate_once(s, slicewise, 1), outside)
        return ns, jnp.any(ns != s)

    reachable, _ = jax.lax.while_loop(cond, body, (seed, jnp.asarray(True)))
    holes = (reachable == 0) & (outside > 0)
    return ((m > 0) | holes).astype(jnp.float32)


_OPS = {
    "dilate": binary_dilate,
    "erode": binary_erode,
    "open": binary_open,
    "close": binary_close,
}


def edit_mask(mask: jnp.ndarray, ops: str, *,
              slicewise: bool = True) -> jnp.ndarray:
    """Apply a comma-separated edit recipe, e.g. ``"close:1,fillholes,erode:2"``.

    Grammar: ``op[:iters]`` with op in {dilate, erode, open, close,
    fillholes}; iters defaults to 1 (ignored for fillholes).  Applied left
    to right.  This is the scriptable form of the reference's "edit mask"
    roadmap item — exposed as ``Vent_Analysis.editMask`` and the CLI's
    ``--mask-edit``.
    """
    m = jnp.asarray(mask)
    for step in ops.split(","):
        step = step.strip()
        if not step:
            continue
        name, _, arg = step.partition(":")
        name = name.strip().lower()
        if name == "fillholes":
            m = fill_holes(m, slicewise=slicewise)
            continue
        if name not in _OPS:
            raise ValueError(
                f"unknown mask-edit op {name!r}; expected one of "
                f"{sorted(_OPS)} or 'fillholes'")
        try:
            iters = int(arg) if arg else 1
        except ValueError:
            raise ValueError(f"bad iteration count in mask-edit step "
                             f"{step!r}") from None
        if iters < 0:
            raise ValueError(f"negative iterations in mask-edit step {step!r}")
        m = _OPS[name](m, iters, slicewise=slicewise)
    return (m > 0).astype(jnp.float32)
