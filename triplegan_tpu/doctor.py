"""Deployment diagnostics: ``python -m triplegan_tpu.cli doctor``.

Beyond-parity extra (the reference has no operational tooling,
[ref-expected] top-level run scripts only — SURVEY.md §2.1): one command
that checks everything a training or serving run is about to depend on,
and names what is broken instead of hanging or crashing later:

  * **device** — PJRT init is probed in a SUBPROCESS with a timeout: on
    TPU VMs a dead driver/tunnel makes ``jax.devices()`` itself hang, so
    an in-process check would hang the doctor too. A timeout is reported
    as a finding, not suffered.
  * **versions** — jax/jaxlib/numpy/orbax versions.
  * **config** — resolves the named config, reports the persisted run-dir
    ``config.json`` merge state.
  * **data** — prepared ``train.npz``/``test.npz`` exist for the config's
    dataset, with shape/dtype sanity; ZCA cache presence for zca configs.
  * **mesh** — ``mesh_shape`` vs visible device count, batch divisibility.
  * **workdir** — checkpoint dir, latest step, torn ``*.orbax-*tmp*``
    leftovers (a crash signature the manager will purge on next write).

Each check yields ``(level, name, message)`` with level ok|warn|fail;
the CLI exits non-zero iff any check failed.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import List, Tuple

Finding = Tuple[str, str, str]  # level, check, message

_DEVICE_PROBE = """
import os
plat = os.environ.get("TRIPLEGAN_PLATFORM")  # set by cli --platform too
if os.environ.get("TRIPLEGAN_DOCTOR_CPU") == "1":
    plat = "cpu"
import jax
if plat == "cpu":
    jax.config.update("jax_platforms", "cpu")
# plat == "tpu" must NOT pin jax_platforms: tunneled chips can register
# under a different plugin name (e.g. 'axon') whose devices still report
# platform 'tpu'; auto-selection finds them, the literal string does not
# (utils/platform.py). The backend assertion below catches CPU fallback.
ds = jax.devices()
if plat == "tpu" and jax.default_backend() != "tpu":
    raise RuntimeError(
        f"tpu requested but auto-selection produced {jax.default_backend()!r}")
import jax.numpy as jnp
x = jnp.ones((8, 8)); float((x @ x).sum())
print("DOCTOR_DEVICES", jax.default_backend(), len(ds))
try:
    stats = ds[0].memory_stats() or {}
    print("DOCTOR_MEM", int(stats.get("bytes_limit", 0)))
except Exception:
    print("DOCTOR_MEM", 0)
"""


def check_device(timeout_s: int = 600):
    """Probe PJRT init + one tiny compile in a subprocess (see module
    docstring for why in-process probing is wrong on TPU VMs). The default
    timeout covers this hardware class's documented healthy startup stalls
    of 1–10 min — a shorter one misdiagnoses a slow-but-working tunnel.

    Returns ``(findings, visible_devices, hbm_bytes)`` — the count is None
    unless the probe succeeded (run_doctor feeds it to :func:`check_mesh`);
    ``hbm_bytes`` is the device's reported per-chip memory limit, or None
    when the runtime doesn't expose it (CPU)."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", _DEVICE_PROBE],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return [(
            "fail",
            "device",
            f"device init hung >{timeout_s}s — on a TPU VM this is the "
            "driver/tunnel, not this framework; retry later, or check the "
            "CPU path with --platform cpu (or TRIPLEGAN_DOCTOR_CPU=1)",
        )], None, None
    visible = hbm = None
    for line in out.stdout.splitlines():
        if line.startswith("DOCTOR_DEVICES"):
            _, backend, n = line.split()
            visible = int(n)
            finding = ("ok", "device", f"{n} {backend} device(s), tiny matmul ran")
        elif line.startswith("DOCTOR_MEM"):
            hbm = int(line.split()[1]) or None
    if visible is not None:
        return [finding], visible, hbm
    tail = (out.stderr or out.stdout).strip().splitlines()
    return [(
        "fail", "device", f"device probe failed: {tail[-1] if tail else 'no output'}"
    )], None, None


def check_versions() -> List[Finding]:
    # A broken install is a thing the doctor exists to DIAGNOSE — a missing
    # package must become a fail finding, not an ImportError traceback.
    parts, findings = [], []
    for label, mod in (
        ("jax", "jax"),
        ("jaxlib", "jaxlib"),
        ("numpy", "numpy"),
        ("orbax", "orbax.checkpoint"),
    ):
        try:
            import importlib

            parts.append(f"{label} {importlib.import_module(mod).__version__}")
        except Exception as e:
            findings.append(
                ("fail", "versions", f"{label} unavailable: {type(e).__name__}: {e}")
            )
    if parts:
        findings.insert(0, ("ok", "versions", ", ".join(parts)))
    return findings


def check_config(cfg, workdir: str) -> List[Finding]:
    saved = os.path.join(workdir, "config.json")
    if os.path.exists(saved):
        return [("ok", "config", f"{cfg.name}: run-dir {saved} merged")]
    return [(
        "warn",
        "config",
        f"{cfg.name}: no persisted config.json under {workdir} "
        "(fresh run dir, or wrong --workdir)",
    )]


def check_data(cfg) -> List[Finding]:
    if cfg.dataset == "synthetic":
        return [("ok", "data", "synthetic dataset (no files needed)")]
    d = os.path.join(cfg.data_dir, cfg.dataset)
    findings: List[Finding] = []
    for split in ("train", "test"):
        path = os.path.join(d, f"{split}.npz")
        if not os.path.exists(path):
            findings.append((
                "fail",
                "data",
                f"missing {path} — run: python -m triplegan_tpu.cli prepare "
                f"--dataset {cfg.dataset} --raw-dir <raw> --data-dir {cfg.data_dir}",
            ))
            continue
        try:
            import numpy as np

            with np.load(path) as f:
                x, y = f["images"], f["labels"]
            if x.dtype != np.uint8 or x.ndim != 4:
                findings.append(
                    ("fail", "data", f"{path}: images must be uint8 NHWC, got "
                                     f"{x.dtype} {x.shape}")
                )
            elif len(x) != len(y):
                findings.append(
                    ("fail", "data", f"{path}: {len(x)} images vs {len(y)} labels")
                )
            else:
                findings.append(
                    ("ok", "data", f"{path}: {len(x)} images {x.shape[1:]}")
                )
        except Exception as e:
            findings.append(("fail", "data", f"{path}: unreadable ({e})"))
    if cfg.zca:
        cache = os.path.join(cfg.workdir, cfg.name, "zca_stats.npz")
        if os.path.exists(cache):
            findings.append(("ok", "zca", f"stats cache {cache}"))
        else:
            findings.append((
                "warn",
                "zca",
                f"no {cache} — first run will fit ZCA from the train set "
                "(one-time cost)",
            ))
    return findings


def check_mesh(cfg, visible_devices: int = None) -> List[Finding]:
    import numpy as np

    n = int(np.prod(cfg.mesh_shape))
    findings: List[Finding] = []
    if cfg.batch_size % n:
        findings.append((
            "fail",
            "mesh",
            f"batch_size={cfg.batch_size} not divisible by the "
            f"{n}-device mesh {tuple(cfg.mesh_shape)}",
        ))
    else:
        findings.append(
            ("ok", "mesh", f"mesh {tuple(cfg.mesh_shape)}, "
                           f"{cfg.batch_size // n} images/device")
        )
    if visible_devices is not None and visible_devices < n:
        findings.append((
            "fail",
            "mesh",
            f"mesh needs {n} devices but only {visible_devices} visible",
        ))
    return findings


def _npz_nbytes(path: str) -> int:
    """Sum of the UNCOMPRESSED array bytes in an .npz, read from the zip
    members' npy headers — no array data is loaded (STL-10's train.npz is
    multi-GB; the doctor must stay fast)."""
    import zipfile

    import numpy as np
    from numpy.lib import format as npy_format

    total = 0
    with zipfile.ZipFile(path) as z:
        for name in z.namelist():
            with z.open(name) as f:
                version = npy_format.read_magic(f)
                shape, _, dtype = npy_format._read_array_header(f, version)
            total += int(np.prod(shape)) * dtype.itemsize
    return total


def check_memory(cfg, hbm_bytes=None) -> List[Finding]:
    """data_on_device=True (the default, and the measured-fastest path)
    uploads the ENTIRE prepared dataset to HBM at startup — a large custom
    dataset OOMs at step 0 after a long prepare. Estimate the resident
    bytes up front and compare against the device's reported memory."""
    if not cfg.get("data_on_device", False):
        return [("ok", "memory", "host-streaming pipeline (data_on_device="
                                 "False); no dataset HBM residency")]
    if cfg.dataset == "synthetic":
        return [("ok", "memory", "synthetic dataset (negligible residency)")]
    # Resident set = the TRAIN split as uint8 (x_labeled duplicates a small
    # subset of it; ZCA/augment run per sampled batch in-step, so no f32
    # copy of the dataset lives on device — data/pipeline.py:131).
    path = os.path.join(cfg.data_dir, cfg.dataset, "train.npz")
    if not os.path.exists(path):
        return []  # the data check already failed loudly
    try:
        resident = _npz_nbytes(path)
    except Exception as e:
        return [("warn", "memory", f"could not size {path} ({e})")]
    human = f"{resident / 2**30:.2f} GiB"
    if hbm_bytes:
        frac = resident / hbm_bytes
        msg = (f"dataset HBM residency ≈ {human} = {frac:.0%} of the "
               f"{hbm_bytes / 2**30:.1f} GiB device limit")
        if frac > 0.9:
            return [("fail", "memory", msg + " — will OOM at startup; set "
                                             "data_on_device=False")]
        if frac > 0.5:
            return [("warn", "memory", msg + " — leaves little room for "
                                             "activations; consider "
                                             "data_on_device=False")]
        return [("ok", "memory", msg)]
    return [("ok", "memory", f"dataset HBM residency ≈ {human} "
                             "(device limit unknown on this backend)")]


def check_workdir(workdir: str) -> List[Finding]:
    ckpt_dir = os.path.join(workdir, "ckpt")
    if not os.path.isdir(ckpt_dir):
        return [("warn", "workdir", f"no checkpoints yet under {ckpt_dir}")]
    steps, torn = [], []
    for name in os.listdir(ckpt_dir):
        if "tmp" in name and "orbax" in name:
            torn.append(name)
        elif name.isdigit():
            steps.append(int(name))
    findings: List[Finding] = []
    if steps:
        findings.append(
            ("ok", "workdir", f"{len(steps)} checkpoint(s), latest step {max(steps)}")
        )
    else:
        findings.append(("warn", "workdir", f"{ckpt_dir} exists but holds no steps"))
    if torn:
        findings.append((
            "warn",
            "workdir",
            f"{len(torn)} torn checkpoint tmp dir(s) (crash leftovers; the "
            "next training run purges them on open)",
        ))
    return findings


def run_doctor(cfg=None, workdir: str = None, skip_device: bool = False,
               device_timeout_s: int = 600) -> List[Finding]:
    findings: List[Finding] = []
    findings += check_versions()
    visible = hbm = None
    if not skip_device:
        device_findings, visible, hbm = check_device(device_timeout_s)
        findings += device_findings
    if cfg is not None:
        findings += check_config(cfg, workdir)
        findings += check_data(cfg)
        findings += check_mesh(cfg, visible_devices=visible)
        findings += check_memory(cfg, hbm_bytes=hbm)
        findings += check_workdir(workdir)
    return findings


def format_findings(findings: List[Finding]) -> str:
    mark = {"ok": "✓", "warn": "!", "fail": "✗"}
    return "\n".join(f"{mark[lv]} {name:<9} {msg}" for lv, name, msg in findings)
