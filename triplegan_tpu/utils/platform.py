"""Backend (platform) selection for cpu|tpu requests.

Two hard-won facts about this hardware class shape the logic here:

* The TPU PJRT plugin ignores ``JAX_PLATFORMS``, so the only reliable way
  to run CPU-side on a TPU VM is ``jax.config.update("jax_platforms",
  "cpu")`` *before* the first jax device use (CLAUDE.md; the CLI's
  ``--platform`` and ``TRIPLEGAN_PLATFORM`` both land here).

* A ``tpu`` request must NOT pin ``jax_platforms`` to the literal string
  ``"tpu"``: tunneled chips can be registered by an out-of-tree plugin
  under a different *platform name* (observed 2026-08-20: platform
  ``axon``, whose devices still report ``device.platform == "tpu"`` and
  ``jax.default_backend() == "tpu"``). Forcing ``"tpu"`` selects the
  in-tree libtpu plugin instead, which cannot see the tunneled device and
  dies with ``No jellyfish device found`` — while plain auto-selection
  prefers the accelerator and works. So ``tpu`` means: leave selection to
  jax, then VERIFY the default backend really is a TPU.
"""

from __future__ import annotations


def apply_platform(platform: str | None) -> None:
    """Apply a ``cpu``/``tpu``/None platform request.

    Must run before the first jax device use. ``None`` is a no-op (auto).
    ``tpu`` initializes the backends immediately (auto-selection) and
    raises RuntimeError if no TPU came up — turning a silent CPU fallback
    into a loud error, since every caller passing "tpu" is about to train
    or measure and a CPU run would produce garbage wall-clock numbers.
    """
    if not platform:
        return
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        return
    if platform != "tpu":
        raise ValueError(f"platform must be 'cpu' or 'tpu', got {platform!r}")
    backend = jax.default_backend()  # first use: triggers auto-selection
    if backend != "tpu":
        raise RuntimeError(
            f"--platform tpu requested but jax auto-selected {backend!r} — "
            "no TPU backend is available (dead tunnel / missing plugin?). "
            "Run `python -m triplegan_tpu.cli doctor` to probe the device."
        )
