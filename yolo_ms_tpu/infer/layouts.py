"""XLA entry-layout pinning for per-batch dispatch serving.

Round-5 measurement (benchmarks/r5_serving_ab.py; PERF.md "Round-5 serving
A/B"): compiling the deploy e2e pipeline with AUTO entry layouts and feeding
the uint8 image batch in the compiler-preferred format (batch-minor,
``major_to_minor=(1,2,3,0)``, tiling ((4,128),(4,1)) on v5e) is +15.7% on
yolov8-n and +7.2% on yolo-ms-xs at bs=128 single-dispatch — the whole win
is the IMAGE entry layout (weights-only AUTO measured 0.97x, worse). The
bench.py scan harness already runs in this regime (its input enters the
program once, so the relayout is amortized — benchmarks/
r5_scan_layout_probe.py measured AUTO == default there), which is exactly
why per-batch dispatch serving needs the explicit pin to match it.

This wraps the pattern for the Predictor (the serving analog of the
reference's per-image inference loop, /root/reference/yolov8/tools/test.py:138-207):
compile once per input shape with ``Layout.AUTO`` entries, pin the weights
into their preferred formats once, and ``device_put`` each arriving
row-major batch into the preferred image format (a per-batch cost — the
net effect at realistic shapes is measured by r5_serving_ab.py's
``relayout+auto`` leg and recorded in PERF.md).

Anything that can't take the fast path (non-TPU backends, older layout
APIs) falls back to plain ``jax.jit`` transparently.
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger(__name__)


def _compile_auto(fn, *example_args):
    """AOT-compile ``fn`` with AUTO entry layouts.

    Returns ``(compiled, formats)`` where ``formats`` is the per-argument
    pytree of compiler-preferred ``Format``s (same structure as
    ``example_args``).
    """
    from jax.experimental.layout import Format, Layout

    jitted = jax.jit(fn, in_shardings=Format(Layout.AUTO))
    compiled = jitted.lower(*example_args).compile()
    fmts = compiled.input_formats
    # (args, kwargs) tuple on newer jax; we compile positional-only
    if (
        isinstance(fmts, tuple)
        and len(fmts) == 2
        and isinstance(fmts[1], dict)
    ):
        fmts = fmts[0]
    return compiled, fmts


class AutoLayoutInfer:
    """``(variables, images) -> out`` callable with pinned entry layouts.

    Caches one AOT executable per image ``(shape, dtype)``; weights are
    device_put into their preferred formats once per executable (the
    ``variables`` argument of later calls is ignored — serving weights are
    immutable after construction, which is the Predictor's contract).
    Falls back to a plain ``jax.jit`` of ``fn`` on any backend/API where
    AUTO layouts are unavailable.
    """

    def __init__(self, fn):
        self._fn = fn
        self._jit_fallback = jax.jit(fn)
        self._cache: dict = {}
        self._disabled = jax.default_backend() not in ("tpu",)

    def _ensure(self, variables, images):
        """(compiled, pinned weights, preferred image Format) for this image
        shape, or None once disabled/fallen back."""
        if self._disabled:
            return None
        key = (tuple(images.shape), str(images.dtype))
        ent = self._cache.get(key)
        if ent is None:
            try:
                compiled, (v_fmt, img_fmt) = _compile_auto(
                    self._fn, variables, images
                )
                v_pinned = jax.tree_util.tree_map(
                    lambda x, f: jax.device_put(x, f), variables, v_fmt
                )
                ent = (compiled, v_pinned, img_fmt)
            except Exception as e:  # pragma: no cover - API/backend drift
                logger.warning(
                    "AUTO entry layouts unavailable (%s); serving falls "
                    "back to default layouts",
                    e,
                )
                self._disabled = True
                return None
            self._cache[key] = ent
        return ent

    def image_format(self, variables, example_images):
        """Compiler-preferred ``Format`` for image batches of this shape
        (compiling on first use), or None on the fallback path. Producers
        can ``jax.device_put`` arriving batches into it so dispatch skips
        the per-batch relayout — the pre-pinned row of the round-5 A/B
        (+16.6% v8-n vs +10.5% with per-batch relayout, PERF.md)."""
        ent = self._ensure(variables, example_images)
        return None if ent is None else ent[2]

    def __call__(self, variables, images):
        ent = self._ensure(variables, images)
        if ent is None:
            return self._jit_fallback(variables, images)
        compiled, v_pinned, img_fmt = ent
        # per-batch relayout of the row-major arrival into the preferred
        # image format (PERF.md round-5: net win at bs>=32 on v5e); skipped
        # when the batch already carries the preferred format
        cur = getattr(images, "format", None)
        if cur is None or str(cur) != str(img_fmt):
            images = jax.device_put(images, img_fmt)
        return compiled(v_pinned, images)
