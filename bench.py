"""End-to-end throughput benchmark.

Measures the full perception pipeline (the reference's hot loop,
coordinate_model.py:277-415) on a synthetic 720p broadcast clip with the
production model configuration: YOLOv8-l at the 960 rectangular letterbox
on every frame, HRNet-W48 at 540x960 on the keypoint cadence, on-device
NMS/decode, and the temporal scan (optical flow, synthesis, RANSAC
homography, tracking).

No trained checkpoints exist in this environment, so the models run
randomly initialized -- the device compute is identical to trained
weights, but raw random outputs drive the pipeline into its degenerate
recovery path (no stable keypoints -> the reference's on-demand
re-detection fires on almost every frame, which trained weights never
do).  To measure the PRODUCTION path, the benchmark keeps every model
forward executing on device and replaces only the returned values with
the synthetic scene's ground truth (what trained models would output):
realistic keypoint tracking, ~11 tracked objects/frame through the
tracker, full host assembly.

Two metrics:
- ``end_to_end_720p_frames_per_sec`` (the headline, stdout JSON): video
  frames in -> raw per-frame coordinate dicts out.
- ``with_processing`` (inside the same JSON line): plus the reference's
  Processor (L3: ball Kalman, team assignment, fragment merge,
  interpolation, long-format output) at production load.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: the driver target of 500 end-to-end 720p fps on a v5e-8
(BASELINE.md), scaled to the number of attached devices.

Robustness contract (the round-4 headline was lost to a driver timeout,
rc=124): the headline JSON line is (re-)emitted to stdout after EVERY
timed rep, every diagnostic print is prefixed so it can never parse as
the headline, a tiny-matmul subprocess probes the tunnel before anything
expensive (CLAUDE.md: the tunnel can wedge entirely), and a global
wall-clock budget (BENCH_BUDGET_S, default 900s) degrades rep count and
diagnostics instead of the output.  SIGTERM/atexit re-emit the
last-known-good line, so the last valid JSON in the output is always the
most complete headline measured so far.
"""

import atexit
import json
import os
import signal
import sys
import time

T_START = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "900"))
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
_LAST_LINE: str | None = None


def remaining() -> float:
    return BUDGET_S - (time.monotonic() - T_START)


def emit(payload: dict) -> None:
    """(Re-)emit the headline line.  Always the full dict, always stdout."""
    global _LAST_LINE
    _LAST_LINE = json.dumps(payload)
    print(_LAST_LINE, flush=True)


def diag(obj) -> None:
    """Diagnostics go to stderr with a '# ' prefix so no diagnostic line
    can ever be mistaken for the headline JSON by the driver's
    last-valid-line parse."""
    text = obj if isinstance(obj, str) else json.dumps(obj)
    for line in text.splitlines() or [""]:
        print(f"# {line}", file=sys.stderr, flush=True)


def _reemit(signum=None, frame=None):
    if _LAST_LINE is not None:
        print(_LAST_LINE, flush=True)
    if signum is not None:
        os._exit(1)


for _sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
    try:
        signal.signal(_sig, _reemit)
    except (ValueError, OSError):
        pass
atexit.register(_reemit)

# Probe code runs in a SUBPROCESS (sequentially -- never two TPU processes
# at once) so a wedged compile RPC can be killed by timeout without taking
# the benchmark process down with it.
_PROBE_CODE = (
    "import jax; "
    f"jax.config.update('jax_compilation_cache_dir', {CACHE_DIR!r}); "
    "jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0); "
    "import jax.numpy as jnp; "
    "x = jnp.ones((256, 256), jnp.bfloat16); "
    "jax.block_until_ready(x @ x); "
    "print('probe-ok')"
)


def probe_tunnel() -> bool:
    """CLAUDE.md wedge probe: a tiny matmul must round-trip in well under
    120s or the tunnel is wedged and nothing code-side will fix it."""
    import subprocess

    attempts = 0
    while attempts < 3:
        attempts += 1
        t0 = time.monotonic()
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_CODE],
                capture_output=True,
                text=True,
                timeout=max(30.0, min(120.0, remaining() - 10.0)),
            )
            if r.returncode == 0 and "probe-ok" in r.stdout:
                diag(f"tunnel probe ok in {time.monotonic() - t0:.1f}s (attempt {attempts})")
                return True
            diag(f"tunnel probe rc={r.returncode}: {r.stderr[-300:]}")
        except subprocess.TimeoutExpired:
            diag(f"tunnel probe TIMED OUT after {time.monotonic() - t0:.0f}s (attempt {attempts})")
        if remaining() < 180:
            diag(f"budget: {remaining():.0f}s left; giving up on the probe")
            return False
        time.sleep(30)
    return False


def main():
    n_devices_guess = 1
    headline = {
        "metric": "end_to_end_720p_frames_per_sec",
        "value": None,
        "unit": f"frames/sec on {n_devices_guess} device(s)",
        "vs_baseline": None,
        "status": "starting",
    }
    emit(headline)

    if not probe_tunnel():
        headline["status"] = "tunnel wedged: tiny-matmul probe failed 3x; no honest number possible"
        emit(headline)
        return 1

    import jax

    # persistent compilation cache: the heavy model compiles are paid once
    # per machine, not once per process; repo-local so the cache survives
    # /tmp cleanup between sessions
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    from eagle_tpu.pipeline.coordinate_model import KP_BATCH, PIECE, CoordinateModel  # noqa: F401
    from eagle_tpu.pipeline.processor import Processor
    from eagle_tpu.utils.profiling import StageTimer
    from eagle_tpu.utils.synthetic import make_scene

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from oracles import oracle_detections_at, oracle_keypoint_fn

    n_devices = len(jax.devices())
    fps_target_per_chip = 500.0 / 8.0
    baseline = fps_target_per_chip * n_devices
    headline["unit"] = f"frames/sec on {n_devices} device(s)"

    num_frames = 96
    scene = make_scene(num_frames=num_frames, width=1280, height=720, num_players=10, fps=24)
    frames = scene.frames
    img_hw = (720, 1280)

    model = CoordinateModel(verbose_init=False)
    geom = model._geometry(img_hw)
    assert geom.enabled, "720p + large_hd must use the working-resolution path"

    # ---- oracle-output injection: every forward still runs on device;
    # only the returned values are replaced with scene ground truth
    real_det = model._det_runner(geom, img_hw)
    D = model.config.detector.max_detections
    oracle_det_rows = []
    for t in range(num_frames):
        b, s, c, v = oracle_detections_at(scene, t, D)
        oracle_det_rows.append(
            np.concatenate(
                [b, s[:, None], c.astype(np.float32)[:, None], v.astype(np.float32)[:, None]],
                axis=-1,
            )
        )
    oracle_det_flat = np.stack(oracle_det_rows).astype(np.float32)  # (N, D, 7)

    det_state = {"i": 0}
    oracle_dev_cache = {}

    @jax.jit
    def _mix(real, oracle):
        # oracle values ride on the REAL detector output's buffer: the
        # result is a device array that cannot materialize before the full
        # YOLOv8-l + NMS program finishes, so the production drain D2H
        # (and its wait on detector compute) stays inside the timed loop
        return oracle + 0.0 * real[..., :7]

    def injected_det(piece):
        real = real_det(piece)  # full YOLOv8-l + NMS executes
        # cursor by the ACTUAL batch size (PIECE on one device, PIECE x
        # n_dev on a sharded host) so shapes always match the caller's
        b = int(piece.shape[0])
        key = (det_state["i"] % num_frames, b)
        det_state["i"] += b
        if key not in oracle_dev_cache:  # uploaded once during warmup
            sel = [(key[0] + k) % num_frames for k in range(b)]
            oracle_dev_cache[key] = jax.device_put(oracle_det_flat[sel])
        return _mix(real, oracle_dev_cache[key])

    model._jit_cache[("det", geom, img_hw)] = injected_det

    kp_fn = oracle_keypoint_fn(scene)
    okp, ovalid = kp_fn(frames[:1])
    oracle_kp = np.concatenate(
        [okp[0], ovalid[0].astype(np.float32)[:, None]], axis=-1
    )  # (57, 4); static camera -> same every frame
    real_pieces_runner = model._kp_pieces_runner

    def injected_pieces_runner(g, hw, pattern):
        real = real_pieces_runner(g, hw, pattern)

        def run(*pieces):
            real(*pieces)  # full HRNet + decode executes; result replaced
            return np.tile(oracle_kp, (len(pattern), 1, 1))

        return run

    model._kp_pieces_runner = injected_pieces_runner

    # warmup: run the full clip once so every shape is compiled before timing
    diag("warmup: single-clip perception")
    model.get_coordinates(frames, 24, num_homography=1, num_keypoint_detection=3, verbose=False)

    # ---- metrics 1 + 3 interleaved: single-clip perception and the
    # 2-clip batched path (BASELINE config 5), alternated every rep so
    # both metrics sample the SAME link-bandwidth distribution (the
    # tunnel drifts on a minutes scale -- sequential blocks systematically
    # bias whichever runs later)
    from eagle_tpu.pipeline.multiclip import MultiClipRunner

    real_kp_fn = model._kp_runner(geom, img_hw)

    def injected_kp_runner(g, hw):
        def run(batch):
            real_kp_fn(batch)  # full HRNet executes; result replaced
            return np.tile(oracle_kp, (len(batch), 1, 1))

        return run

    model._kp_runner = injected_kp_runner
    clips = [frames[:48], frames[48:]]
    mc = MultiClipRunner(model)
    det_state["i"] = 0
    diag("warmup: multi-clip")
    mc.run(clips, 24, num_homography=1, num_keypoint_detection=3)  # warm

    # pipelined serving (pipeline/serve.py): perception + full Processor
    # per clip, post-processing overlapped with the next clip's device
    # phase when a spare core exists.  Measured INSIDE the same rep loop
    # as the other link-sensitive metrics -- the tunnel bandwidth drifts
    # on a minutes scale, so a metric timed in its own later block would
    # systematically sample a different link state than the headline.
    from eagle_tpu.pipeline.serve import serve_clips

    def run_serving():
        det_state["i"] = 0
        t0 = time.perf_counter()
        served = list(
            serve_clips(
                model, [frames, frames], 24, num_homography=1, num_keypoint_detection=3
            )
        )
        assert len(served) == 2 and all(len(r.formatted) > 0 for r in served)
        return time.perf_counter() - t0

    diag("warmup: serving")
    run_serving()  # warm (Processor device-KMeans + prescale-prefetch shapes)

    from eagle_tpu.ops.preprocess import i420_geometry_ok, resolve_upload_format

    i420 = resolve_upload_format(
        model.config.upload_format, geom.enabled
    ) == "yuv420" and i420_geometry_ok(geom, img_hw)
    frame_bytes = geom.canvas_h * geom.canvas_w * (1.5 if i420 else 3.0)

    _disp_f = jax.jit(lambda a: a + 1.0)  # built ONCE (no fresh jit per rep)
    _disp_x = jnp.ones((8, 8), jnp.float32)
    jax.block_until_ready(_disp_f(_disp_x))

    def dispatch_latency_ms() -> tuple[float, float]:
        """Tunnel latency RIGHT NOW, two numbers:

        - marginal per-dispatch cost: the SLOPE between K=10 and K=40
          chained tiny jitted calls ending in one readback (the CLAUDE.md
          protocol).  Measured ~0.2-0.8 ms: async dispatches stream, so
          the marginal cost is far below the RTT.
        - rtt_ms: one chained call + readback — the blocking round trip
          every synchronous drain pays.  THIS is the axis that moves
          across capture days (~25-90 ms observed): the previous
          single-K=20 "dispatch_ms" metric (r03-r05 captures, 0.1-4.5
          ms) was dominated by RTT/20, not by per-dispatch cost, so old
          records should be read as RTT ≈ 20 x dispatch_ms."""

        def chain(k: int) -> float:
            t0 = time.perf_counter()
            y = _disp_x
            for _ in range(k):
                y = _disp_f(y)
            np.asarray(y)  # block_until_ready returns EARLY through the
            # tunnel (CLAUDE.md); a real tiny readback is the only sync
            return time.perf_counter() - t0

        chain(5)  # warm the dispatch path
        slope = max((chain(40) - chain(10)) * 1e3 / 30, 0.0)
        rtt = min(chain(1), chain(1)) * 1e3
        return slope, rtt

    def refresh_headline():
        """Fold everything measured so far into the headline dict and emit.

        The per-rep emission carries status "ok" ONLY when the rep it
        describes passed the production-load validity gate (>= 8 tracked
        players/frame) -- otherwise a driver timeout would freeze an
        "ok" headline for a run whose own assertion would have failed."""
        fps = num_frames / elapsed
        up_s = best_timer.totals.get("upload", 0.0) if best_timer is not None else 0.0
        disp_ms, rtt_ms = dispatch_latency_ms()
        n_trk = float(
            np.mean(
                [
                    len(best_coords[t]["Coordinates"].get("Player", {}))
                    for t in range(num_frames)
                ]
            )
        )
        headline.update(
            {
                "value": round(fps, 2),
                "vs_baseline": round(fps / baseline, 3),
                "serving_fps": round(2 * num_frames / t_serve, 2),
                "serving_vs_baseline": round(2 * num_frames / t_serve / baseline, 3),
                "multi_clip_fps": round(num_frames / t_mc, 2),
                "reps": reps,
                "link_upload_ms_per_frame": round(up_s * 1e3 / num_frames, 2),
                "link_MBps": round(frame_bytes * num_frames / up_s / 1e6, 1)
                if up_s > 0
                else None,
                "dispatch_ms": round(disp_ms, 2),
                "rtt_ms": round(rtt_ms, 1),
                "players_per_frame": round(n_trk, 2),
                "status": "ok"
                if n_trk >= 8
                else f"invalid: {n_trk:.1f} players/frame < 8 (production load expected)",
            }
        )
        emit(headline)

    elapsed = float("inf")
    t_mc = float("inf")
    t_serve = float("inf")
    best_timer = None
    reps = 0
    rep_cost = 0.0
    # best of 3 (the tunnel's link bandwidth fluctuates on a minutes
    # scale, docs/architecture.md "link-state variance"); when even the
    # best rep is link-bound (>50% of its wall clock inside the upload
    # stage) the link is in a degraded state, so sample up to 3 extra
    # reps to give a recovered state a chance to be captured.  Every
    # metric keeps the plain min over ALL reps run -- nothing is
    # discarded or re-weighted.  The wall-clock budget can cut the loop
    # short; the headline emitted after each rep is then the record.
    while True:
        reps += 1
        rep_t0 = time.monotonic()
        det_state["i"] = 0
        timer = StageTimer()
        t0 = time.perf_counter()
        coords = model.get_coordinates(
            frames, 24, num_homography=1, num_keypoint_detection=3, verbose=False, profile=timer
        )
        dt = time.perf_counter() - t0
        if dt < elapsed:
            # keep the best rep's timer AND outputs: the n_tracked assert
            # and metric 2's Processor input must describe the same run
            # the headline reports
            elapsed, best_timer, best_coords = dt, timer, coords
        assert len(coords) == num_frames
        diag(timer.report())

        det_state["i"] = 0
        t0 = time.perf_counter()
        results = mc.run(clips, 24, num_homography=1, num_keypoint_detection=3)
        t_mc = min(t_mc, time.perf_counter() - t0)
        assert len(results) == 2 and len(results[0]) == 48

        t_serve = min(t_serve, run_serving())
        rep_cost = max(rep_cost, time.monotonic() - rep_t0)
        refresh_headline()

        link_bound = best_timer.totals.get("upload", 0.0) > 0.5 * elapsed
        if reps >= 6 or (reps >= 3 and not link_bound):
            break
        if remaining() < 1.5 * rep_cost + 90:
            diag(
                f"budget: {remaining():.0f}s left < rep cost {rep_cost:.0f}s + "
                f"reserve; stopping at {reps} rep(s)"
            )
            break
        if reps >= 3:
            diag(
                f"rep {reps}: still link-bound "
                f"(upload {best_timer.totals.get('upload', 0.0):.2f}s of "
                f"{elapsed:.2f}s); sampling another rep"
            )

    n_tracked = np.mean(
        [len(best_coords[t]["Coordinates"].get("Player", {})) for t in range(num_frames)]
    )
    assert n_tracked >= 8, f"production load expected, got {n_tracked} players/frame"

    # ---- metric 2: + Processor (host post-processing at the same load;
    # the device-KMeans shapes were already compiled by the serving
    # warmup).  Host-only and fast, so it runs before any diagnostics.
    t0 = time.perf_counter()
    proc = Processor(best_coords, frames, 24)
    df, team_mapping = proc.process_data()
    formatted = proc.format_data(df)
    t_processing = time.perf_counter() - t0
    assert len(formatted) > 0 and len(team_mapping) > 0
    fps_proc = num_frames / (elapsed + t_processing)
    diag({"processing_s": round(t_processing, 3), "players_per_frame": float(n_tracked)})
    headline.update(
        {
            "with_processing_fps": round(fps_proc, 2),
            "with_processing_vs_baseline": round(fps_proc / baseline, 3),
        }
    )
    emit(headline)

    # ---- diagnostic (untimed, budget-gated): re-run one perception pass
    # with the scan timer split into "waiting on uploads/detector compute"
    # vs "scan program" -- serializes the chunk pipeline, so it runs
    # OUTSIDE the timed reps and only audits the stage attribution
    # (docs/architecture.md extrapolation model)
    if remaining() > max(120.0, 1.2 * rep_cost):
        det_state["i"] = 0
        split_timer = StageTimer()
        split_timer.split_scan = True
        model.get_coordinates(
            frames, 24, num_homography=1, num_keypoint_detection=3, verbose=False,
            profile=split_timer,
        )
        diag({"scan_split_diagnostic": split_timer.summary()})
        scan_ms = split_timer.totals.get("scan_compute", 0.0) * 1e3 / num_frames
        headline["scan_compute_ms_per_frame"] = round(scan_ms, 2)
        emit(headline)
    else:
        diag(f"budget: {remaining():.0f}s left; skipping scan-split diagnostic")

    # ---- metric 4 (budget-gated): scaling shape on a virtual 8-device
    # CPU mesh (bench_scaling.py): per-device FLOPs ratio of the sharded
    # perception steps, collective bytes, and clip-parallel scan work
    # scale.  These are the compiler-level facts behind the v5e-8
    # extrapolation in docs/architecture.md; run in a subprocess so the
    # CPU mesh never touches this process's TPU client.
    if remaining() > 180:
        import subprocess

        scaling = None
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        env["JAX_PLATFORMS"] = "cpu"
        try:
            res = subprocess.run(
                [
                    sys.executable,
                    os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_scaling.py"),
                ],
                env=env,
                capture_output=True,
                text=True,
                timeout=max(60.0, remaining() - 60.0),
            )
            for line in reversed(res.stdout.strip().splitlines()):
                try:
                    scaling = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
            if scaling is None:
                diag(f"bench_scaling produced no JSON: {res.stderr[-500:]}")
        except (subprocess.TimeoutExpired, OSError) as e:
            diag(f"bench_scaling failed: {e}")
        if scaling is not None:
            headline["scaling"] = scaling
            emit(headline)
    else:
        diag(f"budget: {remaining():.0f}s left; skipping bench_scaling")

    # ---- production-shape v5e-8 AOT facts (TPU compiler, virtual
    # topology): generated by bench_aot_v5e8.py (a ~20 min cold compile,
    # seconds when the persistent cache holds the modules) and stored as
    # AOT_V5E8.json; merged here so the bench record carries the
    # compiler-level evidence behind the v5e-8 extrapolation
    aot_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "AOT_V5E8.json")
    if os.path.exists(aot_path):
        try:
            with open(aot_path) as f:
                aot = json.load(f)
            headline.setdefault("scaling", {})["aot_v5e8"] = aot
            emit(headline)
        except (json.JSONDecodeError, OSError) as e:
            diag(f"AOT_V5E8.json unreadable: {e}")

    return 0


if __name__ == "__main__":
    sys.exit(main())
