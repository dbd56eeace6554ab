"""Batch serving CLI — process a corpus of videos against one reference set.

    python -m person_capture_tpu.sweep --videos DIR_OR_GLOB_OR_FILE ... \
        --ref REF.png --out OUT_ROOT [every person_capture_tpu.main flag] \
        [--shard i/N] [--continue-on-error]

New architecture (no reference analogue: the reference processes ONE video
per GUI run and rebuilds its TRT/ORT sessions each time,
person_capture/gui_app.py:4490-4515). Here the model backends build and
compile ONCE; every video then streams through the same device-resident
XLA programs, so the fleet pays per-video only decode + inference:

- weights upload once (tunneled links pay ~seconds per model family);
- jit programs are shape-keyed inside the backends, so video i+1 reuses
  video i's compiles whenever the batch/det shapes match (they do — the
  pipeline runs fixed shapes by design);
- the recovery ladder's adaptive rotation state is per-video (a fresh
  ``RecoveringFaceBackend`` wraps the shared inner backend per run), so a
  sweep run of video V is decision-identical to a solo run of V;
- the prescan cache is content-addressed (pipeline/cache.py), so
  re-sweeping a grown corpus skips every video already scanned.

Scaling: chips within a host scale via ``--mesh`` / ``--multihost`` exactly
like the single-video CLI; a FLEET of hosts partitions the corpus with
``--shard i/N`` (deterministic round-robin over the sorted video list) —
embarrassingly parallel, no coordinator needed.

Outputs: ``OUT_ROOT/<video-stem>/`` per video (crops + index.csv, same
schema as the single-video CLI) plus ``OUT_ROOT/sweep_summary.json``.
"""

from __future__ import annotations

import copy
import glob
import json
import os
import sys
import time

VIDEO_EXTS = (".mp4", ".m4v", ".mov", ".mkv", ".webm", ".avi", ".ts",
              ".m2ts", ".wmv")


def expand_videos(specs) -> list:
    """Each spec may be a directory (scanned non-recursively for video
    extensions), a glob pattern, or a file path. Returns a sorted,
    deduplicated list; order is deterministic so --shard partitions are
    stable across hosts."""
    out = []
    for spec in specs:
        for part in str(spec).split(";"):
            if not part:
                continue
            if os.path.isdir(part):
                out.extend(os.path.join(part, f)
                           for f in sorted(os.listdir(part))
                           if f.lower().endswith(VIDEO_EXTS))
            elif any(ch in part for ch in "*?["):
                out.extend(p for p in glob.glob(part)
                           if p.lower().endswith(VIDEO_EXTS)
                           and os.path.isfile(p))
            else:
                out.append(part)
    seen = set()
    uniq = []
    for p in sorted(out):
        key = os.path.abspath(p)
        if key not in seen:
            seen.add(key)
            uniq.append(p)
    return uniq


def parse_shard(spec: str):
    """"i/N" → (i, N) with 0 <= i < N."""
    if not spec:
        return 0, 1
    try:
        i_s, n_s = spec.split("/")
        i, n = int(i_s), int(n_s)
    except ValueError:
        raise SystemExit(f"--shard {spec!r}: expected i/N (e.g. 0/4)")
    if n <= 0 or not 0 <= i < n:
        raise SystemExit(f"--shard {spec!r}: need 0 <= i < N")
    return i, n


def _unique_out_dirs(root: str, videos) -> list:
    """Per-video output subdir from the file stem; same-stem collisions
    get a numeric suffix (stable because the video list is sorted)."""
    dirs, used = [], set()
    for v in videos:
        stem = os.path.splitext(os.path.basename(v))[0] or "video"
        cand, k = stem, 2
        while cand in used:
            cand = f"{stem}_{k}"
            k += 1
        used.add(cand)
        dirs.append(os.path.join(root, cand))
    return dirs


def build_sweep_parser():
    from .main import build_parser

    ap = build_parser(require_video=False)
    ap.prog = "person_capture_tpu.sweep"
    ap.add_argument("--videos", action="append", required=True,
                    help="video corpus: directory, glob, or file; "
                         "repeatable and/or ';'-separated")
    ap.add_argument("--shard", default="",
                    help="i/N — process the i-th of N deterministic "
                         "partitions of the corpus (fleet scaling across "
                         "hosts without a coordinator)")
    ap.add_argument("--continue-on-error", action="store_true",
                    help="keep sweeping after a per-video failure "
                         "(recorded in sweep_summary.json)")
    return ap


def main(argv=None) -> int:
    ap = build_sweep_parser()
    args = ap.parse_args(argv)
    if args.video:
        ap.error("--video is not a sweep flag; pass the corpus via "
                 "--videos")

    from .main import (build_config, build_runtime, make_engine,
                       maybe_init_multihost, maybe_pin_platform)

    cfg = build_config(args, ap)
    maybe_pin_platform(cfg)
    out_root = maybe_init_multihost(args, args.out)

    shard_i, shard_n = parse_shard(args.shard)
    videos = expand_videos(args.videos)
    if not videos:
        print("no videos matched --videos", file=sys.stderr)
        return 1
    mine = videos[shard_i::shard_n]
    print(f"[sweep] corpus {len(videos)} video(s); shard {shard_i}/{shard_n}"
          f" -> {len(mine)} here")
    if not mine:
        return 0

    runtime = build_runtime(cfg, args, ap)

    results = []
    t_sweep = time.perf_counter()
    failed = 0
    for video, out_dir in zip(mine, _unique_out_dirs(out_root, mine)):
        cfg_v = copy.deepcopy(cfg)
        cfg_v.video = video
        cfg_v.out_dir = out_dir
        t0 = time.perf_counter()
        print(f"[sweep] {video} -> {out_dir}")
        try:
            eng = make_engine(cfg_v, runtime,
                              status=lambda m, _v=os.path.basename(video):
                              print(f"[pc:{_v}] {m}"))
            res = eng.run()
            ok, err = res.ok, res.error
            hits = len(res.mainpass.hits) if (ok and res.mainpass) else 0
            spans = len(res.spans) if ok else 0
        except Exception as e:             # never lose the rest of a fleet
            ok, err, hits, spans = False, f"{type(e).__name__}: {e}", 0, 0
        wall = time.perf_counter() - t0
        results.append({"video": video, "out_dir": out_dir, "ok": bool(ok),
                        "error": None if ok else str(err),
                        "hits": hits, "spans": spans,
                        "wall_s": round(wall, 2)})
        if ok:
            print(f"[sweep] done: {hits} hits, {spans} span(s), "
                  f"{wall:.1f}s")
        else:
            failed += 1
            print(f"[sweep] FAILED ({wall:.1f}s): {err}", file=sys.stderr)
            if not args.continue_on_error:
                break

    summary = {
        "corpus": len(videos), "shard": f"{shard_i}/{shard_n}",
        "processed": len(results), "failed": failed,
        "wall_s": round(time.perf_counter() - t_sweep, 2),
        "results": results,
    }
    os.makedirs(out_root, exist_ok=True)
    with open(os.path.join(out_root, "sweep_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    done = len(results) - failed
    print(f"[sweep] {done}/{len(mine)} ok in {summary['wall_s']}s; "
          f"summary: {os.path.join(out_root, 'sweep_summary.json')}")
    return 0 if failed == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
