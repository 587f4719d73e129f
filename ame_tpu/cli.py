"""Command-line interface (the reference has none — SURVEY.md §5.6 — but a
production framework needs a headless entry point; the GUI and serve layers
reuse these code paths).

    python -m ame_tpu master in.wav out.wav --lufs -14 --bass 2.5 ...
    python -m ame_tpu analyze song.wav
    python -m ame_tpu serve --port 8080
    python -m ame_tpu gui
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def _float_list(s: str) -> tuple:
    """argparse type for comma-separated floats ("150,1000,6000")."""
    return tuple(float(v) for v in s.split(",") if v.strip())


def _add_master_args(p: argparse.ArgumentParser) -> None:
    from ame_tpu.presets import EQ_PRESETS  # pure data, no heavy imports
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--preset", choices=list(EQ_PRESETS), default=None,
                   help="EQ preset")
    p.add_argument("--analog-character", type=float, default=0.0)
    p.add_argument("--bass", type=float, default=0.0, dest="bass_boost")
    p.add_argument("--mid-cut", type=float, default=0.0, dest="mid_cut")
    p.add_argument("--presence", type=float, default=0.0,
                   dest="presence_boost")
    p.add_argument("--treble", type=float, default=0.0, dest="treble_boost")
    p.add_argument("--width", type=float, default=1.0)
    p.add_argument("--lufs", type=float, default=-14.0)
    p.add_argument("--no-lufs", action="store_true",
                   help="skip loudness normalization")
    p.add_argument("--tp", type=float, default=-1.5, dest="target_tp",
                   help="loudnorm true-peak ceiling in dBTP "
                        "(reference: -1.5)")
    p.add_argument("--lra", type=float, default=11.0, dest="target_lra",
                   help="loudnorm target loudness range in LU "
                        "(reference: 11)")
    p.add_argument("--multiband", action="store_true")
    p.add_argument("--low-thresh", type=float, default=-25.0)
    p.add_argument("--low-ratio", type=float, default=6.0)
    p.add_argument("--mid-thresh", type=float, default=-20.0)
    p.add_argument("--mid-ratio", type=float, default=3.0)
    p.add_argument("--high-thresh", type=float, default=-15.0)
    p.add_argument("--high-ratio", type=float, default=4.0)
    p.add_argument("--mb-edges", type=_float_list, default=None,
                   help="comma-separated crossover Hz for G-band quality "
                        "multiband (e.g. 150,1000,6000 = 4 bands); "
                        "implies --multiband, quality mode only")
    p.add_argument("--mb-thresholds", type=_float_list, default=None,
                   help="per-band thresholds dB (G values; default -20)")
    p.add_argument("--mb-ratios", type=_float_list, default=None,
                   help="per-band ratios (G values; default 3.0)")
    p.add_argument("--mode", choices=["quality", "compat"],
                   default="quality")
    p.add_argument("--compat-chunked", action="store_true",
                   help="emulate the reference's 30s chunk state resets")
    p.add_argument("--bits", type=int, choices=[16, 24, 32], default=16,
                   help="output bit depth (32 = float WAV; default 16 for "
                        "reference parity)")
    p.add_argument("--mp3", action="store_true", help="also export MP3")
    p.add_argument("--shard-time", action="store_true",
                   help="distribute this ONE track's time axis over every "
                        "local device (sequence-parallel chain) — for "
                        "tracks too long or too latency-critical for one "
                        "chip")


def _add_master_args_fleet(p: argparse.ArgumentParser) -> None:
    """Fleet shares the master knobs minus per-file paths."""
    p.add_argument("--analog-character", type=float, default=0.0)
    p.add_argument("--bass", type=float, default=0.0, dest="bass_boost")
    p.add_argument("--mid-cut", type=float, default=0.0, dest="mid_cut")
    p.add_argument("--presence", type=float, default=0.0,
                   dest="presence_boost")
    p.add_argument("--treble", type=float, default=0.0, dest="treble_boost")
    p.add_argument("--width", type=float, default=1.0)
    p.add_argument("--lufs", type=float, default=-14.0)
    p.add_argument("--no-lufs", action="store_true")
    p.add_argument("--multiband", action="store_true")
    p.add_argument("--low-thresh", type=float, default=-25.0)
    p.add_argument("--low-ratio", type=float, default=6.0)
    p.add_argument("--mid-thresh", type=float, default=-20.0)
    p.add_argument("--mid-ratio", type=float, default=3.0)
    p.add_argument("--high-thresh", type=float, default=-15.0)
    p.add_argument("--high-ratio", type=float, default=4.0)
    p.add_argument("--mode", choices=["quality", "compat"],
                   default="quality")


def _settings_from_args(args) -> dict:
    from ame_tpu.presets import EQ_PRESETS
    s = {
        "input_file": args.input,
        "output_file": args.output,
        "analog_character": args.analog_character,
        "bass_boost": args.bass_boost,
        "mid_cut": args.mid_cut,
        "presence_boost": args.presence_boost,
        "treble_boost": args.treble_boost,
        "width": args.width,
        "lufs": None if args.no_lufs else args.lufs,
        "target_tp": args.target_tp,
        "target_lra": args.target_lra,
        "multiband": args.multiband or getattr(args, "mb_edges", None)
        is not None,
        "low_thresh": args.low_thresh, "low_ratio": args.low_ratio,
        "mid_thresh": args.mid_thresh, "mid_ratio": args.mid_ratio,
        "high_thresh": args.high_thresh, "high_ratio": args.high_ratio,
        "mb_edges": getattr(args, "mb_edges", None),
        "mb_thresholds": getattr(args, "mb_thresholds", None),
        "mb_ratios": getattr(args, "mb_ratios", None),
        "mode": args.mode,
        "compat_chunked": args.compat_chunked,
        "bits": args.bits,
        "create_mp3": args.mp3,
    }
    if args.preset:
        s.update(EQ_PRESETS.get(args.preset, {}))
    return s


def main(argv=None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(levelname)s - [%(funcName)s] - %(message)s")
    parser = argparse.ArgumentParser(prog="ame_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    pm = sub.add_parser("master", help="master an audio file")
    _add_master_args(pm)

    pa = sub.add_parser("analyze", help="Musicologist technical brief")
    pa.add_argument("input", nargs="+",
                    help="one or more tracks; several run as ONE batched "
                         "device dispatch")

    pl = sub.add_parser(
        "measure",
        help="BS.1770 loudness report: the full loudnorm pass-1 JSON "
             "analog (input_*/output_* stats incl. input_thresh and "
             "target_offset)")
    pl.add_argument("input")
    pl.add_argument("--lufs", type=float, default=-14.0,
                    help="pass-1 target I (drives the output_* stats)")
    pl.add_argument("--input-only", action="store_true",
                    help="skip the dynamic-normalizer simulation; report "
                         "only the input-side stats")

    ps = sub.add_parser("serve", help="HTTP mastering service")
    ps.add_argument("--host", default="127.0.0.1")
    ps.add_argument("--port", type=int, default=8080)
    ps.add_argument("--workdir", default=None)
    ps.add_argument("--workers", type=int, default=None,
                    help="job worker pool size (default 2 or "
                         "AME_TPU_SERVE_WORKERS)")

    sub.add_parser("gui", help="desktop GUI")

    pp = sub.add_parser(
        "profile",
        help="performance report for the mastering graph on this device: "
             "cold-start compile, steady-state x-realtime, per-stage "
             "breakdown, HBM/RSS peaks; optionally an XLA trace")
    pp.add_argument("input")
    pp.add_argument("--runs", type=int, default=10,
                    help="steady-state timing runs (median reported)")
    pp.add_argument("--no-stages", action="store_true",
                    help="skip the per-stage breakdown (staged-path runs)")
    pp.add_argument("--trace", default=None, metavar="DIR",
                    help="write a jax.profiler trace for tensorboard/xprof")
    _add_master_args_fleet(pp)

    pf = sub.add_parser("fleet", help="master a directory (resumable)")
    pf.add_argument("input_dir")
    pf.add_argument("output_dir")
    pf.add_argument("--manifest", default=None)
    _add_master_args_fleet(pf)

    pu = sub.add_parser(
        "automaster",
        help="fit mastering settings so INPUT spectrally matches REF "
             "(differentiable chain, gradient descent on device)")
    pu.add_argument("input")
    pu.add_argument("ref", help="reference track to match")
    pu.add_argument("output", nargs="?", default=None,
                    help="when given, master INPUT with the fitted "
                         "settings and write the result here")
    pu.add_argument("--steps", type=int, default=200)
    pu.add_argument("--lr", type=float, default=0.05)
    pu.add_argument("--multiband", action="store_true",
                    help="also fit the 6 multiband compressor parameters")
    pu.add_argument("--multi-resolution", action="store_true",
                    help="spectral loss over multiple FFT windows")
    pu.add_argument("--stereo-field", type=float, default=0.0,
                    metavar="W",
                    help="weight of the per-band side/mid stereo-field "
                         "term (makes width identifiable)")
    pu.add_argument("--tp-limit", type=float, default=None, metavar="DBTP",
                    help="penalize fits whose output true peak exceeds "
                         "this ceiling")
    pu.add_argument("--lufs", type=float, default=-14.0)
    pu.add_argument("--no-lufs", action="store_true")

    args = parser.parse_args(argv)

    if args.cmd == "master":
        from ame_tpu.api import master_file, export_mp3_sidecar
        settings = _settings_from_args(args)

        def status(msg):
            print(f"[status] {msg}", file=sys.stderr)

        def progress(cur, total):
            print(f"[progress] {cur}/{total}", file=sys.stderr)

        info = master_file(args.input, args.output, settings, status,
                           progress, shard_time=args.shard_time)
        if settings["create_mp3"]:
            export_mp3_sidecar(args.output, status)
        print(json.dumps(info))
        return 0

    if args.cmd == "analyze":
        if len(args.input) == 1:
            from ame_tpu.analysis.musicologist import analyze_song
            print(json.dumps(analyze_song(args.input[0])))
        else:
            from ame_tpu.analysis.musicologist import analyze_batch
            briefs = analyze_batch(args.input)
            print(json.dumps({p: b for p, b in zip(args.input, briefs)}))
        return 0

    if args.cmd == "measure":
        import jax.numpy as jnp
        from ame_tpu.io import force_stereo, read_audio

        audio, sr = read_audio(args.input)
        x = jnp.asarray(force_stereo(audio))
        if args.input_only:
            from ame_tpu.ops.loudness import measure
            stats = measure(x, sr)
        else:
            from ame_tpu.ops.loudnorm import loudnorm_pass1
            stats = loudnorm_pass1(x, sr, target_i=args.lufs)
            stats["normalization_type"] = "dynamic"
        out = {k: (round(float(v), 2) if not isinstance(v, str) else v)
               for k, v in stats.items()}
        print(json.dumps(out | {"sample_rate": sr}))
        return 0

    if args.cmd == "serve":
        from ame_tpu.serve.server import run_server
        run_server(host=args.host, port=args.port, workdir=args.workdir,
                   workers=args.workers)
        return 0

    if args.cmd == "gui":
        from ame_tpu.gui import run_gui
        run_gui()
        return 0

    if args.cmd == "automaster":
        import jax.numpy as jnp
        from ame_tpu.io import force_stereo, read_audio
        from ame_tpu.models.automaster import fit_settings
        from ame_tpu.ops.resample import resample

        x, sr_x = read_audio(args.input)
        t, sr_t = read_audio(args.ref)
        x, t = force_stereo(x), force_stereo(t)
        if sr_t != sr_x:
            t = resample(jnp.asarray(t), sr_t, sr_x)
        fitted = fit_settings(jnp.asarray(x), sr_x, jnp.asarray(t),
                              steps=args.steps, lr=args.lr,
                              optimize_multiband=args.multiband,
                              multi_resolution=args.multi_resolution,
                              stereo_weight=args.stereo_field,
                              true_peak_weight=(
                                  0.0 if args.tp_limit is None else 1.0),
                              tp_target=(args.tp_limit
                                         if args.tp_limit is not None
                                         else -1.0),
                              verbose=True)
        print(json.dumps(fitted))
        if args.output:
            from ame_tpu.api import master_file
            settings = dict(fitted)
            settings.pop("loss", None)
            settings["lufs"] = None if args.no_lufs else args.lufs
            info = master_file(
                args.input, args.output, settings,
                lambda m: print(f"[status] {m}", file=sys.stderr))
            print(json.dumps(info))
        return 0

    if args.cmd == "profile":
        from ame_tpu.io import force_stereo, read_audio
        from ame_tpu.utils.profiler import profile_master

        audio, sr = read_audio(args.input)
        settings = {k: getattr(args, k) for k in (
            "analog_character", "bass_boost", "mid_cut", "presence_boost",
            "treble_boost", "width", "multiband", "low_thresh", "low_ratio",
            "mid_thresh", "mid_ratio", "high_thresh", "high_ratio", "mode")}
        settings["lufs"] = None if args.no_lufs else args.lufs
        report = profile_master(force_stereo(audio), sr, settings,
                                runs=args.runs, stages=not args.no_stages,
                                trace_dir=args.trace)
        print(json.dumps(report))
        return 0

    if args.cmd == "fleet":
        from ame_tpu.parallel.fleet import run_fleet
        settings = {k: getattr(args, k) for k in (
            "analog_character", "bass_boost", "mid_cut", "presence_boost",
            "treble_boost", "width", "multiband", "low_thresh", "low_ratio",
            "mid_thresh", "mid_ratio", "high_thresh", "high_ratio", "mode")}
        settings["lufs"] = None if args.no_lufs else args.lufs
        summary = run_fleet(args.input_dir, args.output_dir, settings,
                            args.manifest,
                            lambda m: print(f"[fleet] {m}",
                                            file=sys.stderr))
        print(json.dumps(summary))
        return 0 if summary["failed"] == 0 else 2

    return 1


if __name__ == "__main__":
    raise SystemExit(main())
