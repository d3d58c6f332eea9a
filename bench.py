"""Benchmark: CIFAR-10 Triple-GAN three-player train-step throughput.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Metric definition (BASELINE.json): images/sec/chip through the full
three-player (D→G→C) train step on the cifar10_4k config; "images" counts
the per-stream batch size (one iteration advances all three players on
batch_size labeled + batch_size unlabeled + batch_size generated images).

Baseline: the reference publishes no throughput (BASELINE.md). We use an
estimated 2,500 img/s for the TF-1.x reference on a single A100 (three
sequential sess.runs of small-conv graphs, f32) as the denominator;
the driver-set target is ≥5× that per chip. Override via
BENCH_BASELINE_IMG_S.

Tunables: BENCH_BATCH (default 384), BENCH_DTYPE (default bfloat16),
BENCH_SCAN (default 20 — train steps per lax.scan chunk / dispatch),
BENCH_STEPS (default 8 — number of *dispatches*, so the timed region runs
BENCH_STEPS × BENCH_SCAN train steps), BENCH_DEVICE_DATA (default 1 —
HBM-resident dataset; 0 = host-fed double-buffered pipeline, where
BENCH_SCAN is forced to 1), BENCH_RBG, BENCH_FUSED_CLF, BENCH_PALLAS,
BENCH_NO_AUG, BENCH_NO_ZCA, BENCH_CONFIG, BENCH_PROFILE.

Headline policy (round 5): every deviation from shipped training
semantics in the headline knob set must carry a real-data full-training
quality A/B (docs/PARITY.md §11). Qualified and ON: bf16 compute
(p=0.852) and share_pseudo_forward (p=1.000, §9). Measured HARMFUL and
OFF: rbg PRNG + u8 dropout masks (the pair reproduced the full-ensemble
regression; see §11) — BENCH_RBG=1 / BENCH_DROPOUT_BITS=8 remain as
explicit opt-in throughput knobs for non-headline sweeps.

Robustness: device init is probed first in a subprocess with a timeout
(BENCH_DEVICE_TIMEOUT, default 600 s per probe; BENCH_DEVICE_RETRIES
probes, default 3, with BENCH_DEVICE_RETRY_BACKOFF s between them,
default 200 — the 2026-08-17/18 outage showed the tunnel often returns
within minutes; all probes+backoffs are capped by
BENCH_DEVICE_TOTAL_BUDGET, default 1200 s, so the honest error JSON
lands before a plausible outer driver timeout; skip with
BENCH_SKIP_DEVICE_GUARD=1). Only after every probe fails does a dead TPU
tunnel yield one honest error-JSON line instead of a hang. Each
successful on-chip run AT THE HEADLINE KNOB SET (every BENCH_* knob at
its default) records its output line to BENCH_LATEST.json (suppress
with BENCH_NO_RECORD=1), which is where the guard's "last recorded
measurement" context is read from — never a hardcoded literal (VERDICT
r3 weak #1/#3); variant/sweep runs never overwrite it.
"""

from __future__ import annotations

import json
import os
import time

import jax


def _last_recorded_bench(root: str = None) -> str:
    """Newest recorded on-chip throughput, read from the repo's bench
    artifacts — the driver-written ``BENCH_r*.json`` and the bench-written
    ``BENCH_LATEST.json`` — so the outage message carries live context
    instead of a hardcoded constant that silently rots. Returns a short
    human string, or '' when no artifact carries a number."""
    import glob

    root = root or os.path.dirname(os.path.abspath(__file__))
    best = None  # (key, label)
    for path in glob.glob(os.path.join(root, "BENCH_*.json")):
        try:
            with open(path) as f:
                rec = json.load(f)
        except Exception:
            continue
        parsed = rec.get("parsed", rec)
        value = parsed.get("value") if isinstance(parsed, dict) else None
        if not isinstance(value, (int, float)):
            continue
        name = os.path.basename(path)
        # Recency key: file mtime first (on the machine where this guard
        # runs, whichever artifact was WRITTEN last is the freshest number —
        # a newer driver record must beat a stale LATEST whose refresh was
        # suppressed). Tie-break equal mtimes — a fresh `git clone` stamps
        # every artifact with the same checkout time (VERDICT r4 weak #5) —
        # by the round number in the BENCH_r*.json name, then the record's
        # own "recorded" date, so a clean checkout never reports round 1 as
        # the last recorded measurement.
        try:
            mtime = os.path.getmtime(path)
        except OSError:
            mtime = 0.0
        import re

        m = re.match(r"BENCH_r0*(\d+)\.json$", name)
        round_no = int(m.group(1)) if m else -1
        when = rec.get("recorded", "")
        key = (mtime, round_no, when)
        label = f"{value} img/s ({name}{', ' + when if when else ''})"
        if best is None or key > best[0]:
            best = (key, label)
    return best[1] if best else ""


# Every BENCH_* knob that changes what the number MEANS, with its default.
# A run qualifies as "the headline measurement" (and may refresh
# BENCH_LATEST.json) only when all of them are at defaults — BENCH_STEPS /
# BENCH_BASELINE_IMG_S affect timing quality and the ratio denominator,
# not the measured configuration, so they are deliberately absent.
_HEADLINE_KNOBS = {
    "BENCH_BATCH": "384", "BENCH_DTYPE": "bfloat16", "BENCH_SCAN": "20",
    "BENCH_DEVICE_DATA": "1", "BENCH_RBG": "0", "BENCH_DROPOUT_BITS": "32",
    "BENCH_FUSED_CLF": "0", "BENCH_PALLAS": "0", "BENCH_SHARE_FWD": "1",
    "BENCH_NO_AUG": "0", "BENCH_NO_ZCA": "0", "BENCH_CONFIG": "cifar10_4k",
    "BENCH_PEAK_TFLOPS": "197",
}


def _is_headline_run() -> bool:
    return all(os.environ.get(k, d) == d for k, d in _HEADLINE_KNOBS.items())


def _guard_device_init() -> None:
    """Probe PJRT init in a SUBPROCESS before benching: on this TPU VM a
    dead driver/tunnel makes ``jax.devices()`` itself hang forever
    (observed 2026-08-17/18 outage), which would leave the driver with NO
    bench line at all. The probe is retried with a backoff (the r3 outage
    cost the round its artifact on a single-probe guard — VERDICT r3
    weak #1); only after every probe fails does it become an honest error
    JSON. Disable with BENCH_SKIP_DEVICE_GUARD=1 (e.g. when a prior step
    in the same job already held the device). The probe exits before the
    real bench initializes, so the one-device-process rule holds."""
    if os.environ.get("BENCH_SKIP_DEVICE_GUARD") == "1":
        return
    from triplegan_tpu.doctor import check_device

    timeout_s = int(os.environ.get("BENCH_DEVICE_TIMEOUT", "600"))
    retries = max(1, int(os.environ.get("BENCH_DEVICE_RETRIES", "3")))
    backoff_s = float(os.environ.get("BENCH_DEVICE_RETRY_BACKOFF", "200"))
    # Total-deadline cap: with a fully dead tunnel, unbounded retries would
    # stay silent for retries×timeout + backoffs (~37 min at defaults) —
    # long enough that an outer driver/CI timeout kills the process with NO
    # output, re-creating the exact lost-artifact failure this guard exists
    # to prevent. The error JSON must land within the budget; retry probes
    # shrink to the remaining time (min 60 s) and stop when none is left.
    total_budget = float(os.environ.get("BENCH_DEVICE_TOTAL_BUDGET", "1200"))
    t_start = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        remaining = total_budget - (time.monotonic() - t_start)
        probe_t = timeout_s if attempt == 1 else int(min(timeout_s, max(remaining, 60)))
        findings, _, _ = check_device(probe_t)
        if findings[0][0] == "ok":
            return
        remaining = total_budget - (time.monotonic() - t_start)
        if attempt >= retries or remaining < backoff_s + 60:
            break
        time.sleep(backoff_s)
    last = _last_recorded_bench()
    print(
        json.dumps(
            {
                "metric": "cifar10_4k_triplegan_3player_step_throughput",
                "value": None,
                "unit": "images/sec/chip",
                "vs_baseline": None,
                "error": findings[0][2]
                + f" — after {attempt} probes ({timeout_s}s budget each, "
                f"{backoff_s:g}s backoff, {total_budget:g}s total cap)"
                + (f" — last recorded on-chip measurement: {last}" if last else ""),
            }
        )
    )
    raise SystemExit(0)


def main() -> None:
    import jax as _jax

    from triplegan_tpu.utils.cache import enable_compilation_cache

    # Same backend override as the CLI (the TPU plugin ignores
    # JAX_PLATFORMS): TRIPLEGAN_PLATFORM=cpu runs the whole measurement
    # path off-chip — a smoke test of the driver gate, not a TPU number
    # (tests/test_doctor.py::test_bench_cpu_smoke). The device guard probes
    # the DEFAULT backend, so it is skipped when the bench won't use it.
    platform = os.environ.get("TRIPLEGAN_PLATFORM")
    if platform == "cpu":
        _jax.config.update("jax_platforms", "cpu")
    # platform == "tpu" deliberately does NOT pin jax_platforms: the chip
    # may be registered under a different plugin name (e.g. 'axon') that
    # auto-selection finds but the literal string breaks — see
    # triplegan_tpu/utils/platform.py. The guard below probes the DEFAULT
    # backend and fails loudly if no accelerator comes up.
    if platform != "cpu":
        _guard_device_init()

    enable_compilation_cache()
    if os.environ.get("BENCH_RBG", "0") == "1":
        # Hardware RBG PRNG: cheaper dropout/noise mask generation on TPU
        # than the default threefry counter-based PRNG. OFF the headline
        # since round 5: the rbg+u8 factor REGRESSED real-data final error
        # in a 10-seed full-training A/B (docs/PARITY.md §11) — the
        # throughput it buys (~+2%) no longer carries the headline.
        _jax.config.update("jax_default_prng_impl", "rbg")
    if os.environ.get("BENCH_DROPOUT_BITS", "32") == "8":
        # u8-bits dropout masks (4× less RNG material; keep-prob quantized
        # to n/256 — exact for 0.5, ≤0.1% bias at 0.8). A/B 2026-08-17:
        # 8587 vs 8440 img/s. OFF the headline since round 5, with rbg
        # (same A/B, PARITY §11); opt back in with BENCH_DROPOUT_BITS=8.
        os.environ["TRIPLEGAN_DROPOUT_BITS"] = "8"

    from triplegan_tpu.configs import get_config
    from triplegan_tpu.configs.base import make_networks
    from triplegan_tpu.data.datasets import synthetic_dataset
    from triplegan_tpu.data.pipeline import (
        BatchSampler,
        device_prefetch,
        upload_device_data,
    )
    from triplegan_tpu.data.zca import fit_zca
    from triplegan_tpu.train.schedule import make_optimizers
    from triplegan_tpu.train.state import create_state
    from triplegan_tpu.train.step import (
        make_device_train_step,
        make_scan_device_train_step,
        make_train_step,
    )

    # Defaults are the measured optimum (see docs/DESIGN.md perf journal):
    # with u8 dropout the r3 batch sweep peaks at 384 (256→8587, 320→8491,
    # 384→8675/8669, 448→8428, 512→8418); scan chunks remove per-step
    # dispatch (10→8669, 20→8712, 40→8718 — plateau; default 20).
    batch = int(os.environ.get("BENCH_BATCH", "384"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    n_steps = int(os.environ.get("BENCH_STEPS", "8"))
    baseline = float(os.environ.get("BENCH_BASELINE_IMG_S", "2500"))

    cfg = get_config(os.environ.get("BENCH_CONFIG", "cifar10_4k"))
    cfg.mesh_shape = (1,)  # bench measures one real chip
    cfg.batch_size = batch
    cfg.compute_dtype = dtype
    cfg.fused_clf_forward = os.environ.get("BENCH_FUSED_CLF", "0") == "1"
    cfg.use_pallas = os.environ.get("BENCH_PALLAS", "0") == "1"
    # Default ON since round 4: the −9% FLOP lever was quality-qualified
    # on real data (10-seed digits A/B, perm p=1.000) and for stability at
    # the cifar10_4k architecture (3-seed synthetic A/B) — docs/PARITY.md
    # §9. Shipped dataset configs keep it off (reference semantics);
    # BENCH_SHARE_FWD=0 restores the exact-semantics bench.
    cfg.share_pseudo_forward = os.environ.get("BENCH_SHARE_FWD", "1") == "1"
    if os.environ.get("BENCH_NO_AUG", "0") == "1":
        cfg.aug_translate = 0
        cfg.aug_flip = False
    if os.environ.get("BENCH_NO_ZCA", "0") == "1":
        cfg.zca = False

    # Config-shaped synthetic data (the step's cost is data-independent).
    data = synthetic_dataset(
        image_size=cfg.image_size, channels=cfg.channels,
        num_classes=cfg.num_classes,
        n_train=4096, n_test=256, num_labeled=512,
    )
    # Fit on all 4096 synthetic samples: >= 3072 pixel dims keeps the
    # covariance full-rank, so the recorded bench artifact is warning-free.
    zca = fit_zca(data.x_unlabel) if cfg.zca else None

    total_steps = 10_000
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, total_steps)
    state = create_state(cfg, nets, opts)
    on_device = os.environ.get("BENCH_DEVICE_DATA", "1") == "1"
    # scan only applies to the device-data step (host path needs a fresh
    # batch per step); keep the throughput math consistent.
    scan_steps = int(os.environ.get("BENCH_SCAN", "20")) if on_device else 1
    if on_device:
        # HBM-resident dataset, batches sampled inside the compiled step —
        # zero host↔device transfers in the hot loop.
        device_data = upload_device_data(data)
        if scan_steps > 1:
            # lax.scan chunk with hoisted batch sampling: one dispatch and
            # one big gather per scan_steps steps.
            inner = make_scan_device_train_step(
                cfg, nets, opts, total_steps, scan_steps, zca_stats=zca
            )
        else:
            inner = make_device_train_step(cfg, nets, opts, total_steps, zca_stats=zca)
        step = jax.jit(inner, donate_argnums=0)
        next_batch = lambda: device_data
    else:
        step = jax.jit(
            make_train_step(cfg, nets, opts, total_steps, zca_stats=zca),
            donate_argnums=0,
        )
        sampler = BatchSampler(data, cfg.batch_size, seed=0)
        batches = device_prefetch(
            sampler.triple_iter(cfg.z_dim, cfg.num_classes), depth=2
        )
        next_batch = lambda: next(batches)

    # Model FLOPs from XLA's cost analysis, so the recorded artifact carries
    # its own MFU denominator instead of only the estimated-A100 ratio
    # (VERDICT r2 next-step #2). Analyzed on a scan-FREE single-step lowering:
    # XLA's cost model counts a lax.scan body once (not ×trip count), so the
    # scanned program's flops ARE per-step flops only by accident of that
    # convention — the unchunked step is unambiguous. (Measured r3: 4.007
    # TFLOP/step at batch 256, matching the r2 roofline analysis.)
    flops_per_step = None
    try:
        if on_device:
            cost_fn = make_device_train_step(cfg, nets, opts, total_steps, zca_stats=zca)
        else:
            cost_fn = make_train_step(cfg, nets, opts, total_steps, zca_stats=zca)
        lowered = jax.jit(cost_fn).lower(state, next_batch())
        cost = lowered.cost_analysis()
        if cost is None:  # axon/TPU plugin: only the compiled executable knows
            cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost["flops"])
    except Exception:
        pass  # cost model unavailable on this backend — fields stay null

    # Warmup: compile + 3 steps. Fence with a real device→host fetch:
    # block_until_ready has been observed to return early on tunneled
    # runtimes, inflating throughput by an order of magnitude.
    for _ in range(3):
        state, metrics = step(state, next_batch())
    float(metrics["loss_d"])

    profile_dir = os.environ.get("BENCH_PROFILE", "")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, next_batch())
    float(metrics["loss_d"])  # hard sync
    dt = time.perf_counter() - t0
    if profile_dir:
        jax.profiler.stop_trace()

    total_inner_steps = n_steps * scan_steps
    imgs_per_sec = total_inner_steps * batch / dt
    # The benched step is a plain single-device jax.jit (mesh_shape=(1,)):
    # exactly ONE chip executes it regardless of how many are visible, so
    # per-chip throughput divides by 1, not jax.device_count().
    value = imgs_per_sec / 1

    # Denominator-independent context (VERDICT r2 next-step #2): wall time
    # per train step (scan chunks amortize dispatch, so this ≈ device time),
    # model TFLOPs per step from XLA's cost model, and the resulting MFU
    # against the chip's nominal bf16 peak (v5e: 197 TF/s; override with
    # BENCH_PEAK_TFLOPS for other chips / dtypes).
    ms_per_step = dt / total_inner_steps * 1e3
    peak_tflops = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
    tflops_per_step = (flops_per_step / 1e12) if flops_per_step else None
    mfu = (
        round(tflops_per_step / (ms_per_step / 1e3) / peak_tflops, 4)
        if tflops_per_step
        else None
    )
    result = {
        "metric": f"{cfg.name}_triplegan_3player_step_throughput",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        # 4 significant digits, not fixed decimals: a slow CPU
        # smoke run must not round a real nonzero ratio to 0.0.
        "vs_baseline": float(f"{value / baseline:.4g}"),
        "device_ms_per_step": round(ms_per_step, 3),
        "model_tflops_per_step": (
            round(tflops_per_step, 4) if tflops_per_step else None
        ),
        "mfu": mfu,
        "peak_tflops": peak_tflops,
        # Echo of bench settings that differ from the shipped config
        # defaults (threefry / batch 100 / f32): this is a throughput
        # configuration, not the parity configuration (weak #7).
        "config": {
            "batch": batch,
            "dtype": dtype,
            "prng_impl": "rbg" if os.environ.get("BENCH_RBG", "0") == "1" else "threefry",
            "dropout_bits": int(os.environ.get("TRIPLEGAN_DROPOUT_BITS", "32")),
            "scan_steps": scan_steps,
            "data_on_device": on_device,
            "share_pseudo_forward": cfg.share_pseudo_forward,
            **({"platform": platform} if platform else {}),
        },
    }
    print(json.dumps(result))
    # Refresh the on-disk "last known good" record the device-guard error
    # message reads from. Only real-chip HEADLINE-configuration runs
    # qualify: a CPU smoke or an A/B variant run (different batch/dtype/
    # flags via the BENCH_* knobs) must not masquerade as the headline
    # number — the gate checks every result-affecting knob against its
    # default, not just the config name.
    if (
        platform != "cpu"
        and os.environ.get("BENCH_NO_RECORD") != "1"
        and _is_headline_run()
        and jax.default_backend() != "cpu"
    ):
        try:
            path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH_LATEST.json")
            with open(path, "w") as f:
                json.dump(
                    {"recorded": time.strftime("%Y-%m-%d"), "parsed": result},
                    f, indent=1,
                )
                f.write("\n")
        except OSError:
            pass  # a read-only checkout must not fail the measurement


if __name__ == "__main__":
    main()
