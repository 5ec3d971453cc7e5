"""Command-line interface, flag-compatible with the reference's shared
surface (options.c:186-551). File/offline mode runs the TPU pipeline; SDR
capture flags are accepted but require a streaming ingest host (see
io.readers) — live SDR hardware backends are not built into this image.

Stats line parity: gr-iridium-format 1 Hz stderr line (main.c:483-501),
emitted per processed block in offline mode.
"""

from __future__ import annotations

import argparse
import sys
import time


from .config import DetectorConfig, DownmixConfig
from .decode import batch as batch_mod
from .decode import ida as ida_mod
from .output.raw import RawPrinter


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="iridium-tpu",
        description="TPU-native Iridium burst detector and demodulator. "
                    "Outputs iridium-toolkit compatible RAW format to stdout.")
    p.add_argument("-f", "--file", help="read IQ samples from file")
    p.add_argument("--format", choices=("ci8", "ci16", "cf32"),
                   help="IQ file format (default: by extension, else ci8)")
    p.add_argument("-c", "--center-freq", type=float, default=1_622_000_000,
                   help="center frequency in Hz (default: 1622000000)")
    p.add_argument("-r", "--sample-rate", type=int, default=10_000_000,
                   help="sample rate in Hz (default: 10000000)")
    p.add_argument("-d", "--threshold", type=float, default=16.0,
                   help="burst detection threshold in dB (default: 16.0)")
    p.add_argument("--file-info", default=None,
                   help="file info string for output (default: auto)")
    p.add_argument("--no-pallas", action="store_true",
                   help="alias for --fir conv (the XLA verification "
                        "path, cf. reference --no-simd/--no-gpu)")
    p.add_argument("--no-gardner", action="store_true",
                   help="disable Gardner timing recovery")
    p.add_argument("--parsed", action="store_true",
                   help="output parsed IDA lines")
    p.add_argument("--diagnostic", action="store_true",
                   help="setup verification mode (suppresses RAW output)")
    p.add_argument("--gsmtap", nargs="?", const="127.0.0.1:4729",
                   metavar="HOST:PORT",
                   help="send IDA frames as GSMTAP via UDP")
    p.add_argument("--zmq", nargs="?", const="tcp://*:7006",
                   metavar="ENDPOINT",
                   help="publish output via ZMQ PUB socket")
    p.add_argument("--web", nargs="?", const=8888, type=int, metavar="PORT",
                   help="enable live web map")
    p.add_argument("--position", nargs="?", const=-1.0, type=float,
                   metavar="HEIGHT_M",
                   help="estimate receiver position from Doppler shift "
                        "(optional height aiding in meters)")
    p.add_argument("--acars", action="store_true",
                   help="decode and display ACARS messages from IDA")
    p.add_argument("--acars-json", action="store_true",
                   help="output ACARS as JSON")
    p.add_argument("--acars-udp", action="append", default=[],
                   metavar="HOST:PORT", help="stream ACARS JSON via UDP")
    p.add_argument("--feed", nargs="?",
                   const="tcp://feed.airframes.io:5590",
                   metavar="PROTO://HOST:PORT",
                   help="feed aggregator (udp:// for acarshub, tcp:// "
                        "for airframes.io)")
    p.add_argument("--station", default="IRIDIUM-TPU",
                   help="station identifier for ACARS JSON output")
    p.add_argument("--save-bursts", metavar="DIR",
                   help="save IQ samples of decoded bursts to directory")
    p.add_argument("--profile", metavar="DIR",
                   help="write a jax.profiler trace (TensorBoard/Perfetto "
                        "format) for the run and print the per-stage "
                        "timing breakdown (SURVEY.md §5: the TPU analogue "
                        "of the reference's external CPU profiling, "
                        "ARCHITECTURE.md:630-634)")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("--burst-batch", type=int, default=128,
                   help="device burst batch size (TPU tuning)")
    p.add_argument("--frames-per-block", type=int, default=512,
                   help="FFT frames per device block (TPU tuning)")
    p.add_argument("--agg-blocks", type=int, default=None,
                   help="blocks per aggregated device->host fetch "
                        "(TPU tuning; default 4 offline, 1 for stdin "
                        "live mode to keep output latency at one block)")
    p.add_argument("--fir", choices=("mxu", "conv"), default="mxu",
                   help="decimating-FIR implementation: 'mxu' "
                        "polyphase-matmul (default) or the 'conv' "
                        "verification path (cf. reference --no-simd)")
    p.add_argument("--gather", choices=("auto", "pallas", "xla"),
                   default="auto",
                   help="burst-window gather implementation: 'auto' = "
                        "Pallas kernel on TPU / XLA elsewhere; force "
                        "'xla' to A/B the kernel on real hardware "
                        "(cf. reference --no-simd, ARCHITECTURE.md:638)")
    p.add_argument("--scan", choices=("auto", "pallas", "xla"),
                   default="auto",
                   help="detector state-machine implementation: "
                        "'auto' = single-Mosaic-kernel scan on TPU / "
                        "XLA branchless scan elsewhere; force 'xla' "
                        "to A/B the kernel on real hardware")
    p.add_argument("--mesh", type=int, metavar="N",
                   help="run the capture through the N-device sharded "
                        "SPMD pipeline (multi-chip; with "
                        "jax.distributed initialized from the "
                        "environment this spans hosts, and output is "
                        "emitted on host 0 only)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not args.file:
        print("error: -f/--file required (SDR capture needs a live "
              "ingest host; see documentation)", file=sys.stderr)
        return 2

    # Persistent XLA compilation cache: the reference persists FFTW wisdom
    # for the same reason (main.c:60-78) -- first-run planning/compiles are
    # expensive
    import os
    import jax
    cache_dir = os.environ.get("IRIDIUM_TPU_CACHE",
                               os.path.expanduser("~/.iridium-tpu-xla-cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from .runtime.pipeline import Pipeline   # deferred: heavy import

    det = DetectorConfig(
        center_frequency=args.center_freq,
        sample_rate=args.sample_rate,
        threshold_db=args.threshold,
        frames_per_block=args.frames_per_block,
    )
    # LLRs cross the (slow) device->host boundary only when a protocol
    # decoder consumes them; the RAW line itself never prints them.
    decode_active = (args.parsed or args.gsmtap or args.web is not None
                     or args.position is not None or args.acars
                     or args.acars_json or args.acars_udp or args.feed)
    live_in = args.file in ("-", "/dev/stdin")
    agg = args.agg_blocks if args.agg_blocks else (1 if live_in else 4)
    if args.mesh:
        # Sharded SPMD pipeline over an N-device mesh (multi-host when
        # jax.distributed is initialized; SURVEY.md §2.5).
        from .parallel import distributed
        from .parallel.stream import ShardedPipeline
        from jax.sharding import Mesh
        import numpy as _np
        distributed.initialize()
        devs = _np.array(jax.devices()[:args.mesh])
        if len(devs) < args.mesh:
            print(f"error: --mesh {args.mesh} but only {len(devs)} "
                  "devices available", file=sys.stderr)
            return 2
        if args.save_bursts:
            print("warning: --save-bursts is not supported on the "
                  "--mesh sharded path; ignoring", file=sys.stderr)
        pipe = ShardedPipeline(det, mesh=Mesh(devs, ("shards",)),
                               burst_batch=args.burst_batch,
                               use_gardner=not args.no_gardner,
                               want_llr=bool(decode_active),
                               fir_mode=("conv" if args.no_pallas
                                         else args.fir),
                               gather_mode=args.gather,
                               agg_blocks=agg,
                               scan_mode=("xla" if args.no_pallas
                                          else args.scan))
    else:
        pipe = Pipeline(det_cfg=det, dm_cfg=DownmixConfig(),
                        burst_batch=args.burst_batch,
                        use_gardner=not args.no_gardner,
                        save_bursts_dir=args.save_bursts,
                        fir_mode="conv" if args.no_pallas else args.fir,
                        want_llr=bool(decode_active),
                        agg_blocks=agg,
                        detect_impl=("fast"
                                     if args.scan == "xla"
                                     or args.no_pallas
                                     else args.scan),
                        gather_mode=args.gather)
    printer = RawPrinter(args.file_info)

    zmq_sock = None
    if args.zmq is not None:
        try:
            import zmq as zmq_mod
            ctx = zmq_mod.Context()
            zmq_sock = ctx.socket(zmq_mod.PUB)
            zmq_sock.bind(args.zmq.replace("*", "0.0.0.0")
                          if "*" in args.zmq else args.zmq)
        except ImportError:
            print("warning: pyzmq not available, --zmq disabled",
                  file=sys.stderr)

    gsmtap = None
    if args.gsmtap:
        from .output.gsmtap import GsmtapSender
        host, _, port = args.gsmtap.partition(":")
        gsmtap = GsmtapSender(host or "127.0.0.1", int(port or 4729))

    web = None
    if args.web is not None:
        from .output.web_map import WebMap
        web = WebMap(port=args.web)
        web.start()

    doppler = None
    if args.position is not None:
        from .decode.doppler import DopplerSolver
        doppler = DopplerSolver(
            height_aid_m=None if args.position < 0 else args.position)

    acars = None
    if args.acars or args.acars_json or args.acars_udp or args.feed:
        from .decode.sbd_acars import AcarsDecoder, FeedSender
        feed = FeedSender(args.feed) if args.feed else None
        acars = AcarsDecoder(json_out=args.acars_json,
                             udp_targets=args.acars_udp,
                             station=args.station,
                             feed_sender=feed)

    need_ida = (args.parsed or gsmtap is not None or acars is not None
                or web is not None)
    # Three independent reassembly contexts, like the reference's
    # ida_ctx / acars_ida_ctx / mtpos_ida_ctx (main.c:351-369): each
    # consumer sees every reassembled message exactly once.
    reasm_gsmtap = ida_mod.IdaReassembler() if gsmtap else None
    reasm_acars = ida_mod.IdaReassembler() if acars else None
    reasm_mtpos = ida_mod.IdaReassembler() if web is not None else None

    # any ACARS mode suppresses RAW stdout (reference frame_output.c:162,
    # options.c:403-431: --acars/--acars-json/--acars-udp/--feed all set
    # acars_enabled)
    acars_mode = acars is not None

    def emit(line: str) -> None:
        if not args.diagnostic and not acars_mode:
            print(line)
        if zmq_sock is not None:
            zmq_sock.send_string(line)

    t_start = time.time()
    last_stat = t_start
    last_solve = t_start
    last_waiting = t_start
    prev = dict(det=0, ok=0, handled=0, samples=0)
    samp_rate = args.sample_rate
    # Live mode: stdin pipe ("-" / /dev/stdin). The reference switches
    # the first stats column from srr% to i:/s when live (main.c:487-492,
    # options.c:512-524: -i implies live).
    live = args.file in ("-", "/dev/stdin")

    def stats_line() -> None:
        nonlocal last_stat, last_solve, last_waiting, prev
        now = time.time()
        dt = now - last_stat
        if dt < 1.0:
            return
        s = pipe.stats
        elapsed = now - t_start
        dd = s.n_detected - prev["det"]
        dk = s.n_ok - prev["ok"]
        dh = s.n_handled - prev["handled"]
        dsamp = s.n_samples - prev["samples"]
        srr = dsamp / (samp_rate * dt) * 100 if dt > 0 else 0
        in_ok = 100.0 * dk / dd if dd > 0 else 0
        ok_avg = 100.0 * s.n_ok / s.n_detected if s.n_detected else 0
        if args.diagnostic:
            # guided-setup display (reference main.c:444-481)
            rt = int(elapsed)
            bpm = s.n_detected * 60.0 / elapsed if elapsed > 0 else 0
            nf = pipe.noise_floor_db()
            pk = pipe.peak_signal_db()
            line = (f"Runtime: {rt // 3600:02d}:{rt % 3600 // 60:02d}:"
                    f"{rt % 60:02d}  |  Bursts: {s.n_detected} detected "
                    f"({bpm:.1f}/min)  |  Decoded: {s.n_ok} "
                    f"(ok_avg: {ok_avg:.0f}%)  |  Noise: {nf:.1f} dBFS/Hz"
                    f"  |  Peak: {pk:.1f} dB  ")
            if s.n_detected == 0 and elapsed > 120:
                line += "| No bursts detected - check antenna"
            elif ok_avg >= 70 and bpm >= 3:
                line += f"| Setup looks good (gap: {pk - nf:.1f} dB)"
            elif ok_avg < 70 and s.n_detected > 10:
                line += "| Low decode rate - try adjusting gain"
            elif ok_avg >= 70 and bpm < 3 and elapsed > 60:
                line += "| Good decode rate but low burst count"
            print(line, file=sys.stderr)
            last_stat = now
            prev = dict(det=s.n_detected, ok=s.n_ok, handled=s.n_handled,
                        samples=s.n_samples)
            return
        first = (f"i: {dd / dt:3.0f}/s" if live
                 else f"srr: {srr:5.1f}%")
        print(f"{int(now)} | {first}"
              f" | i_avg: {s.n_detected / elapsed:3.0f}/s"
              f" | q_max: {pipe.take_q_peak():4d}"
              f" | i_ok: {in_ok:3.0f}%"
              f" | o: {dh / dt:4.0f}/s"
              f" | ok: {in_ok:3.0f}%"
              f" | ok: {dk / dt:3.0f}/s"
              f" | ok_avg: {ok_avg:3.0f}%"
              f" | ok: {s.n_ok:10d}"
              f" | ok_avg: {s.n_ok / elapsed:3.0f}/s"
              f" | d: {s.n_dropped}", file=sys.stderr)
        last_stat = now
        prev = dict(det=s.n_detected, ok=s.n_ok, handled=s.n_handled,
                    samples=s.n_samples)
        # Doppler solve every ~10 s; "waiting" note every ~60 s while
        # unconverged (reference main.c:507-519)
        if doppler is not None and now - last_solve >= 10 and elapsed > 5:
            last_solve = now
            sol = doppler.solve()
            if sol.converged:
                print(f"POSITION: {sol.lat:.6f}, {sol.lon:.6f} "
                      f"(HDOP={sol.hdop:.1f}, {sol.n_satellites} sats, "
                      f"{sol.n_measurements} meas)", file=sys.stderr)
                if web is not None:
                    web.set_position(sol.lat, sol.lon, sol.hdop)
            elif now - last_waiting >= 60:
                last_waiting = now
                print(f"POSITION: waiting ({sol.n_satellites} sats, "
                      f"{sol.n_measurements} meas)", file=sys.stderr)

    if args.profile:
        jax.profiler.start_trace(args.profile)

    n_gsmtap = 0
    need_frame = web is not None or doppler is not None
    # multihost --mesh: side-channel outputs are host-0-only (SURVEY.md
    # §2.5; the reference's stdout/sockets have no multi-process analogue)
    emit_host = (not args.mesh) or jax.process_index() == 0
    from .io import native
    bs = pipe.p.block_samples
    for frames in pipe.run_blocks(native.read_blocks(args.file, bs,
                                                     args.format)):
        if not emit_host:
            continue
        # Block-vectorized protocol decode: one decode_block call covers
        # every frame's BCH/LCW/IDA math (matches the throughput role of
        # frame_decode.c:414-598 / ida_decode.c:543-664; the scalar
        # modules remain the parity oracle, tests/test_decode.py).
        if need_ida or need_frame:
            results = batch_mod.decode_block(
                frames, want_frame=need_frame, want_ida=need_ida)
        else:
            results = [(None, None)] * len(frames)
        for f, (decoded, ida_burst) in zip(frames, results):
            if args.parsed and ida_burst is not None:
                emit(printer.format_ida(ida_burst))
            else:
                emit(printer.format(f))

            if decoded is not None:
                kind, d = decoded
                if kind == "IRA":
                    if web is not None:
                        web.add_ra(d, f["timestamp_ns"], f["frequency"])
                    if doppler is not None:
                        doppler.add_measurement(d, f["frequency"],
                                                f["timestamp_ns"])
                elif kind == "IBC" and web is not None:
                    web.add_sat(d, f["timestamp_ns"])

            if gsmtap is not None and ida_burst is not None:
                def _send(data, ts, freq, direction, mag):
                    nonlocal n_gsmtap
                    gsmtap.send(data, freq, direction, mag)
                    n_gsmtap += 1
                reasm_gsmtap.push(ida_burst, _send)
                reasm_gsmtap.flush(f["timestamp_ns"])
            if acars is not None and ida_burst is not None:
                reasm_acars.push(
                    ida_burst,
                    lambda data, ts, freq, d, m: acars.process(
                        data, ts, freq, d, m))
                reasm_acars.flush(f["timestamp_ns"])
            if reasm_mtpos is not None:
                # MT position layer on the map (main.c:365-369 →
                # mtpos_ida_cb, web_map.c:280-361)
                if ida_burst is not None:
                    reasm_mtpos.push(ida_burst, web.mtpos_ida_cb)
                reasm_mtpos.flush(f["timestamp_ns"])
            stats_line()

    if args.profile:
        jax.profiler.stop_trace()
        t = pipe.timing
        nb = max(t["n_blocks"], 1)
        print("profile: per-stage cumulative wall seconds "
              "(threads overlap; ratios localize the bottleneck):",
              file=sys.stderr)
        for k in ("step_dispatch", "group_dispatch", "result_fetch_wait",
                  "host_parse", "host_format"):
            print(f"profile:   {k:<18} {t[k]:8.3f} s "
                  f"({t[k] / nb * 1e3:7.2f} ms/block)", file=sys.stderr)
        print(f"profile:   blocks={t['n_blocks']} "
              f"groups={t['n_groups']} "
              f"overflow_rounds={t['n_overflow_rounds']}; "
              f"trace written to {args.profile}", file=sys.stderr)

    # Shutdown summary prints unconditionally, like the reference
    # (burst_detect.c:350-351).
    print(f"burst_detect: tagged {pipe.stats.n_detected} bursts total",
          file=sys.stderr)
    if pipe.stats.n_em_dropped or pipe.stats.n_create_waits:
        # bounded-capacity divergence accounting (detect_fast /
        # detect_pallas docstrings): emission-cap drops are a subset of
        # the d: counter; create-waits deferred a peak to a later frame
        print(f"burst_detect: {pipe.stats.n_em_dropped} emission-cap "
              f"drops, {pipe.stats.n_create_waits} deferred creations",
              file=sys.stderr)
    if gsmtap is not None:
        print(f"gsmtap: sent {n_gsmtap} frames", file=sys.stderr)
    if acars is not None:
        acars.print_stats()
    if web is not None:
        web.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
