"""Serving export: trained checkpoints → deployable inference artifacts.

Beyond-parity extra: the reference stops at eval scripts ([ref-expected]
``Testing/``, SURVEY.md §2.1 #11) — it has no deployment story. This module
packages the two servable functions of a trained Triple-GAN run:

  * **classifier**: ``uint8 NHWC images -> class logits`` with the
    training-time input transform baked in (rescale to [-1,1], ZCA
    whitening for zca configs) — the artifact is self-contained, callers
    send raw pixels.
  * **generator**: ``(z float32 [B,z_dim], y int32 [B]) -> images`` in the
    generator's raw [-1,1] space.

Formats (pick per deployment target):

  * ``stablehlo`` — :func:`jax.export.export` serialization: portable,
    version-stable bytes, loadable from any PjRT runtime and re-importable
    in-process via :func:`jax.export.deserialize` (the TPU-native serving
    path: compile once, run under ``jit`` anywhere). Exported for both
    ``cpu`` and ``tpu`` lowering platforms when possible.
  * ``savedmodel`` — TF SavedModel via ``jax2tf`` native serialization
    (the same StableHLO wrapped for TF Serving / ``tf.saved_model.load``).
  * ``npz`` — raw parameter/BN arrays keyed ``player/layer/array``
    (framework-free interchange).

Batch size is static (production-typical); export one artifact per serving
shape.
"""

from __future__ import annotations

import os
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class QTensor(NamedTuple):
    """A weight-only int8-quantized array: ``q * scale`` reconstructs the
    weight. ``scale`` is per-output-channel (last axis), float32."""

    q: Any
    scale: Any


def quantize_int8(params):
    """Weight-only post-training quantization for serving (opt-in,
    ``export --quantize int8``): every kernel (ndim ≥ 2: conv HWIO, dense
    IO) becomes int8 with a per-output-channel float32 scale; biases, BN
    affines, and other 1-D arrays stay float32. Symmetric round-to-nearest
    with the scale chosen so max|w| maps to 127 — reconstruction error is
    ≤ scale/2 per element. The exported StableHLO then embeds int8
    constants: measured 3.7× smaller artifacts. (Weight-HBM savings at
    serve time depend on the runtime — XLA may constant-fold the dequant;
    unmeasured, see DESIGN.md.) Activations/compute are unchanged."""

    def enc(w):
        w = np.asarray(w)
        if w.ndim < 2:
            return jnp.asarray(w)
        amax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
        scale = (np.maximum(amax, 1e-12) / 127.0).astype(np.float32)
        q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
        return QTensor(jnp.asarray(q), jnp.asarray(scale))

    return jax.tree.map(enc, params)


def dequantize(params, dtype=jnp.float32):
    """Inverse of :func:`quantize_int8` — inside a traced serving fn the
    int8 ``q`` tensors become int8 *constants* of the exported program and
    the multiply is the only added compute."""
    return jax.tree.map(
        lambda x: x.q.astype(dtype) * x.scale.astype(dtype)
        if isinstance(x, QTensor)
        else x,
        params,
        is_leaf=lambda x: isinstance(x, QTensor),
    )


def make_serving_fns(
    cfg, nets, state, zca_stats=None, quantize: Optional[str] = None
) -> Tuple[Callable, Callable]:
    """Build ``(classify, generate)`` pure functions over a restored state.

    ``classify(images_u8) -> logits`` — eval-mode classifier, training
    input transform baked in. ``generate(z, y) -> images`` — eval-mode
    generator, raw [-1,1] output space. ``quantize="int8"`` applies
    weight-only PTQ (:func:`quantize_int8`) to both players' kernels.
    """
    from triplegan_tpu.data import ondevice

    gen, _, clf = nets
    if zca_stats is not None:
        zm = jnp.asarray(zca_stats.mean)
        zw = jnp.asarray(zca_stats.whiten)
    else:
        zm = zw = None
    rescale = bool(cfg.get("rescale", True))
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    params_c, bn_c = state.params["clf"], state.bn["clf"]
    params_g, bn_g = state.params["gen"], state.bn["gen"]
    if quantize is not None:
        if quantize != "int8":
            raise ValueError(f"quantize must be None or 'int8', got {quantize!r}")
        qc, qg = quantize_int8(params_c), quantize_int8(params_g)
        # Re-materialize the f32 weights INSIDE the traced fns so the
        # artifact stores int8 constants, not the dequantized product.
        params_c = None  # cut the f32 references; dequant below
        params_g = None

        def _params_c():
            return dequantize(qc)

        def _params_g():
            return dequantize(qg)
    else:

        def _params_c():
            return params_c

        def _params_g():
            return params_g

    def classify(images_u8):
        # Exactly the eval path (train/step.py make_eval_step): the same
        # on-device transform, INCLUDING the compute-dtype cast — a bf16
        # config must serve the same logits `cli eval` computes.
        x = ondevice.standard_pipeline(
            None,
            images_u8,
            zca_mean=zm,
            zca_whiten=zw,
            train=False,
            dtype=cdt,
            do_rescale=rescale,
        )
        logits, _ = clf.apply(_params_c(), bn_c, x, train=False)
        return logits.astype(jnp.float32)  # f32 at the serving boundary

    def generate(z, y):
        x, _ = gen.apply(_params_g(), bn_g, z, y, train=False)
        return x

    return classify, generate


def _export_platforms():
    """StableHLO lowering platforms: cpu always; tpu too so one artifact
    serves both (falls back to single-platform if the lowering refuses)."""
    return ("cpu", "tpu")


def export_stablehlo(fn: Callable, args: tuple, path: str) -> str:
    """Serialize ``fn(*args_spec)`` as portable StableHLO bytes.

    ``args`` are ShapeDtypeStructs (or arrays — shapes/dtypes are taken).
    Reload with :func:`load_stablehlo`."""
    specs = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args)
    platforms = _export_platforms()
    try:
        exported = jax.export.export(jax.jit(fn), platforms=platforms)(*specs)
    except Exception as e:
        # e.g. a platform-specific custom call blocks multi-platform
        # lowering. Fall back to the default backend only — LOUDLY: a
        # silently single-platform artifact fails far away, at deploy time.
        import warnings

        warnings.warn(
            f"export_stablehlo: multi-platform export for {platforms} failed "
            f"({type(e).__name__}: {e}); falling back to the current default "
            f"backend ({jax.default_backend()}) only — this artifact will NOT "
            "load on other platforms",
            stacklevel=2,
        )
        exported = jax.export.export(jax.jit(fn))(*specs)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_stablehlo_exported(path: str):
    """Re-import a :func:`export_stablehlo` artifact as the full
    ``jax.export.Exported`` (exposes ``in_avals`` etc. for callers that
    need the serving shape contract)."""
    with open(path, "rb") as f:
        return jax.export.deserialize(f.read())


def load_stablehlo(path: str) -> Callable:
    """Re-import a :func:`export_stablehlo` artifact as a callable (runs
    under jit on whatever backend is active — in-process serving)."""
    return load_stablehlo_exported(path).call


def export_savedmodel(
    fns: dict, specs: dict, path: str
) -> str:
    """Wrap jax functions as one TF SavedModel with a serving signature per
    entry. ``fns``: name -> callable; ``specs``: name -> tuple of
    ShapeDtypeStructs describing its positional args."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    module = tf.Module()
    signatures = {}
    for name, fn in fns.items():
        tf_specs = [
            tf.TensorSpec(s.shape, tf.dtypes.as_dtype(np.dtype(s.dtype)), name=f"{name}_arg{i}")
            for i, s in enumerate(specs[name])
        ]
        tf_fn = tf.function(
            jax2tf.convert(fn),  # native serialization (StableHLO) is the default
            input_signature=tf_specs,
            autograph=False,
        )
        setattr(module, name, tf_fn)
        signatures[name] = tf_fn.get_concrete_function(*tf_specs)
    tf.saved_model.save(module, path, signatures=signatures)
    return path


def export_npz(state, path: str) -> str:
    """Flatten params+BN state to ``player/layer/array`` keys (arrays only
    — the framework-free interchange format)."""
    flat = {}
    for kind, tree in (("params", state.params), ("bn", state.bn)):
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for keypath, leaf in leaves:
            name = "/".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
            )
            flat[f"{kind}/{name}"] = np.asarray(leaf)
    np.savez(path, **flat)
    return path


def export_artifacts(
    cfg,
    nets,
    state,
    out_dir: str,
    what: str = "both",
    fmt: str = "stablehlo",
    batch_size: Optional[int] = None,
    zca_stats=None,
    quantize: Optional[str] = None,
) -> list:
    """Export the requested servables; returns the written paths.

    ``what``: classifier|generator|both. ``fmt``: stablehlo|savedmodel|npz.
    ``quantize="int8"``: weight-only PTQ (:func:`quantize_int8`) baked into
    the traced artifact — int8 weight constants, same graph otherwise.
    """
    os.makedirs(out_dir, exist_ok=True)
    if quantize and fmt == "npz":
        raise ValueError(
            "quantize applies to traced artifacts (stablehlo/savedmodel); "
            "npz stores the raw f32 parameters"
        )
    b = int(batch_size or cfg.batch_size)
    classify, generate = make_serving_fns(
        cfg, nets, state, zca_stats, quantize=quantize
    )
    img = jax.ShapeDtypeStruct(
        (b, int(cfg.image_size), int(cfg.image_size), int(cfg.channels)),
        jnp.uint8,
    )
    z = jax.ShapeDtypeStruct((b, int(cfg.z_dim)), jnp.float32)
    y = jax.ShapeDtypeStruct((b,), jnp.int32)

    targets = {}
    if what in ("classifier", "both"):
        targets["classify"] = (classify, (img,))
    if what in ("generator", "both"):
        targets["generate"] = (generate, (z, y))
    if not targets:
        raise ValueError(f"what must be classifier|generator|both, got {what!r}")

    written = []
    if fmt == "stablehlo":
        for name, (fn, specs) in targets.items():
            written.append(
                export_stablehlo(fn, specs, os.path.join(out_dir, f"{name}.stablehlo"))
            )
    elif fmt == "savedmodel":
        written.append(
            export_savedmodel(
                {n: fn for n, (fn, _) in targets.items()},
                {n: specs for n, (_, specs) in targets.items()},
                os.path.join(out_dir, "savedmodel"),
            )
        )
    elif fmt == "npz":
        written.append(export_npz(state, os.path.join(out_dir, "params.npz")))
    else:
        raise ValueError(f"fmt must be stablehlo|savedmodel|npz, got {fmt!r}")
    return written
