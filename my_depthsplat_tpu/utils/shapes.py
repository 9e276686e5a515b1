"""Runtime shape checking at the public seams.

The reference wraps all of ``src`` in a jaxtyping+beartype import hook
(src/main.py:22-37) so every annotated tensor shape is validated on every
call — its de-facto unit-test layer. beartype is not in this image, so this
module provides the equivalent guarantee explicitly: ``assert_shapes``
validates a dict of arrays against symbolic specs (shared dimension letters
must agree across entries), and the encoder / decoder / loss entry points
call it on their inputs. A transposed batch or a (B, V)-swap fails loudly
with the offending name, spec, and actual shape instead of producing a wrong
number.

Checks run at trace time on shapes only (no device sync, zero runtime cost
under jit).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence


class ShapeError(ValueError):
    pass


def assert_shapes(
    specs: Mapping[str, tuple[Any, Sequence]],
    dims: dict[str, int] | None = None,
) -> dict[str, int]:
    """Validate ``{name: (array, spec)}`` where spec is a sequence of
    ints (exact), strings (symbolic, must agree everywhere the letter
    appears), or None (unchecked). Returns the resolved symbol bindings.

    >>> assert_shapes({"image": (img, ("B", "V", "H", "W", 3))})
    """
    dims = dict(dims or {})
    for name, (arr, spec) in specs.items():
        if arr is None:
            continue
        shape = tuple(getattr(arr, "shape", ()))
        if len(shape) != len(spec):
            raise ShapeError(
                f"{name}: expected rank {len(spec)} {tuple(spec)}, got shape "
                f"{shape}"
            )
        for axis, (actual, want) in enumerate(zip(shape, spec)):
            if want is None:
                continue
            if isinstance(want, str):
                bound = dims.setdefault(want, actual)
                if bound != actual:
                    raise ShapeError(
                        f"{name}: axis {axis} ({want}) is {actual}, but "
                        f"{want}={bound} elsewhere (full shape {shape}, "
                        f"spec {tuple(spec)})"
                    )
            elif actual != want:
                raise ShapeError(
                    f"{name}: axis {axis} expected {want}, got {actual} "
                    f"(full shape {shape}, spec {tuple(spec)})"
                )
    return dims


def check_views(views: Mapping[str, Any], who: str,
                dims: dict[str, int] | None = None) -> dict[str, int]:
    """Validate a context/target view dict (the batch schema every model
    entry point consumes): image (B,V,H,W,3), intrinsics (B,V,3,3),
    extrinsics (B,V,4,4), near/far (B,V), optional depth (B,V,h,w)."""
    specs = {
        f"{who}.image": (views.get("image"), ("B", "V", None, None, 3)),
        f"{who}.intrinsics": (views.get("intrinsics"), ("B", "V", 3, 3)),
        f"{who}.extrinsics": (views.get("extrinsics"), ("B", "V", 4, 4)),
        f"{who}.near": (views.get("near"), ("B", "V")),
        f"{who}.far": (views.get("far"), ("B", "V")),
    }
    if views.get("depth") is not None:
        specs[f"{who}.depth"] = (views["depth"], ("B", "V", None, None))
    return assert_shapes(specs, dims)


def check_gaussians(g, who: str = "gaussians") -> dict[str, int]:
    """Flattened Gaussians: means (B,N,3), covariances (B,N,3,3),
    harmonics (B,N,3,d_sh), opacities (B,N)."""
    return assert_shapes(
        {
            f"{who}.means": (g.means, ("B", "N", 3)),
            f"{who}.covariances": (g.covariances, ("B", "N", 3, 3)),
            f"{who}.harmonics": (g.harmonics, ("B", "N", 3, None)),
            f"{who}.opacities": (g.opacities, ("B", "N")),
        }
    )
