"""CLI entry point — the ``mdedup`` analogue (ref: cli.py:571-686).

    python -m mail_deduplicate_ray dedup --input clips.parquet --out /tmp/out \
        --strategy select-newest --strategy select-biggest \
        --size-threshold 512 --content-threshold 768 [--dry-run] [--hash-only]

Steps mirror the reference lifecycle (SURVEY.md §3.1): read -> signatures
[-> stop if --hash-only, ref cli.py:656-674] -> candidates -> components ->
settle -> action -> report + stats self-check.  This script owns the Ray
session (the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mail_deduplicate_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dedup", help="run the dedup pipeline")
    d.add_argument("--input", action="append", required=True,
                   help="clips parquet file/dir (or Lance uri); repeatable. "
                        "The same source twice is a hard error "
                        "(≙ ref: deduplicate.py:936-956)")
    d.add_argument("--time-source", default=None,
                   help="timestamp column for time strategies, or 'none' to "
                        "disable them (default ingest_ts; ≙ TimeSource, "
                        "ref: mail.py:51-64)")
    d.add_argument("--out", default=None, help="output dir for kept rows")
    d.add_argument("--strategy", action="append", default=[],
                   help="selection strategy (repeatable, cascade order; "
                        "aliases accepted)")
    d.add_argument("--regexp", default=None)
    d.add_argument("--hash-body", default="normalized",
                   choices=["skip", "raw", "normalized"])
    d.add_argument("--hash-columns", default=None,
                   help="comma-separated metadata columns for the exact key "
                        "(≙ --hash-headers, ref: cli.py:62-94); default "
                        "sr_hz,codec_norm,dur_bucket")
    d.add_argument("--size-threshold", type=int, default=512)
    d.add_argument("--content-threshold", type=int, default=768)
    d.add_argument("--channels",
                   default="exact,minhash,audio,containment,substring,"
                           "stretch")
    d.add_argument("--cc-method", default=None,
                   choices=["hashmin", "star"],
                   help="distributed connected-components engine: hashmin "
                        "(min-label + pointer jumping, default) or star "
                        "(large/small-star contraction — O(log n) rounds "
                        "on chain-shaped duplicate graphs)")
    d.add_argument("--checkpoint-root", default=None)
    d.add_argument("--action", default=None,
                   choices=["copy-selected", "copy-discarded",
                            "move-selected", "move-discarded",
                            "delete-selected", "delete-discarded",
                            "dedup-storage"],
                   help="verb x target applied after settle (≙ ref Action "
                        "enum action.py:281-339, verb routing :268-278): "
                        "copy/move write the target subset to --out (move "
                        "also emits a tombstone manifest), delete writes a "
                        "tombstone manifest only, dedup-storage links "
                        "discarded rows to their winner's blob (hardlink "
                        "analogue). Default with --out: copy-selected")
    d.add_argument("--append", action="store_true",
                   help="copy/move only: add new part files to an existing "
                        "output dataset (generation-stamped, manifest "
                        "tracked) instead of replacing it (≙ create_box "
                        "append, ref: mail_box.py:490-511)")
    d.add_argument("--shards", type=int, default=None,
                   help="copy actions only: write the output as N "
                        "resumable hive-style shard=NNNN/ dirs keyed by "
                        "hash(clip_id); a re-run after a failure skips "
                        "finished shards (sources/sharded.py)")
    d.add_argument("--allow-differing", action="store_true",
                   help="dedup-storage only: link discarded rows whose "
                        "content hash differs from the winner's "
                        "(≙ --hardlink-differing, ref: action.py:156-192)")
    d.add_argument("--export-codec", default=None,
                   help="re-encode kept clips to this codec on export "
                        "(transcode action; requires --out)")
    d.add_argument("--export-sr", type=int, default=None,
                   help="resample kept clips to this rate on export "
                        "(with --export-codec)")
    d.add_argument("--dry-run", action="store_true")
    d.add_argument("--hash-only", action="store_true",
                   help="print signatures and stop (ref: cli.py:656-674)")
    d.add_argument("--num-cpus", type=int, default=None)
    d.add_argument("--ray-address", default=None,
                   help="Ray cluster address; default $RAY_ADDRESS or "
                        "'local'. Under `ray job submit` pass 'auto' (or "
                        "let the job runtime set RAY_ADDRESS) so the run "
                        "attaches to the multi-node cluster instead of "
                        "starting a one-node session")
    d.add_argument("--config", default=None,
                   help="TOML config file ([dedup] table, strict keys; "
                        "CLI flags override — ref: cli.py:299-318)")
    q = sub.add_parser(
        "query", help="run any registered pipeline/operator by name over "
                      "a directory of parquet tables (the full operator "
                      "inventory: dedup, near-dup, sampling, curation, "
                      "joins, windows, audio/image/video analysis)")
    q.add_argument("name", nargs="?", default=None,
                   help="operator name; omit (or pass 'list') to print "
                        "the registry")
    q.add_argument("--sf-dir", default=None,
                   help="directory holding the parquet tables the "
                        "operator reads (documents/embeddings/events/...)")
    q.add_argument("--out", default=None,
                   help="write the result as parquet to this dir; "
                        "default prints the first --limit rows")
    q.add_argument("--limit", type=int, default=20,
                   help="rows to print when --out is not given")
    q.add_argument("--num-cpus", type=int, default=None)
    q.add_argument("--ray-address", default=None)
    a = sub.add_parser(
        "augment", help="speed-perturbation augmentation: re-emit every "
                        "decodable clip at each tempo factor "
                        "(anti-aliased polyphase Blackman-sinc resampler, "
                        "pcm_s16le output; Kaldi 3-way recipe)")
    a.add_argument("--input", action="append", required=True,
                   help="clips parquet file/dir; repeatable")
    a.add_argument("--out", required=True,
                   help="output dir for the augmented clips parquet")
    a.add_argument("--factors", default="0.9,1.1",
                   help="comma-separated tempo factors (>0; factor > 1 "
                        "shortens; default 0.9,1.1)")
    a.add_argument("--num-cpus", type=int, default=None)
    a.add_argument("--ray-address", default=None)
    f = sub.add_parser(
        "diff", help="verbose labeled diff of two clips' normalized "
                     "transcripts (≙ pretty_diff, ref: deduplicate.py:384-401)")
    f.add_argument("--input", action="append", required=True)
    f.add_argument("--time-source", default=None)
    f.add_argument("clip_a")
    f.add_argument("clip_b")
    f.add_argument("--num-cpus", type=int, default=None)
    f.add_argument("--ray-address", default=None)
    return p


def run_diff(args) -> int:
    import pyarrow as pa
    import pyarrow.compute as pc

    from mail_deduplicate_ray.functions import normalize
    from mail_deduplicate_ray.sources import read_clips
    from mail_deduplicate_ray.stages.settle import pretty_diff
    ts_col = args.time_source or "ingest_ts"
    want = {args.clip_a, args.clip_b}
    rows: dict[str, tuple[str, float | None]] = {}
    ds = read_clips(list(args.input))
    for b in ds.iter_batches(batch_format="pyarrow"):
        mask = pc.is_in(b["clip_id"], value_set=pa.array(sorted(want)))
        b = b.filter(mask)
        if b.num_rows == 0:
            continue
        tnorm = normalize.normalize_transcript(b["transcript"])
        ts = (b[ts_col].to_pylist() if ts_col != "none" and
              ts_col in b.schema.names else [None] * b.num_rows)
        for i in range(b.num_rows):
            rows[b["clip_id"][i].as_py()] = (tnorm[i].as_py() or "", ts[i])
    missing = want - rows.keys()
    if missing:
        raise ValueError(f"clip ids not found: {sorted(missing)}")
    a, b_ = rows[args.clip_a], rows[args.clip_b]
    out = pretty_diff(args.clip_a, a[0], a[1], args.clip_b, b_[0], b_[1])
    print(out if out else "(transcripts identical)")
    return 0


def run_augment(args) -> int:
    from mail_deduplicate_ray.sources import read_clips
    from mail_deduplicate_ray.stages import bucketing
    from mail_deduplicate_ray.stages.audio_stats import SpeedPerturbStage

    factors = tuple(float(f) for f in args.factors.split(",") if f)
    if not factors or any(f <= 0 for f in factors):
        raise ValueError(f"--factors must be positive floats, "
                         f"got {args.factors!r}")
    ds = read_clips(list(args.input))
    _, hi = bucketing.pool_size()
    out = ds.map_batches(
        SpeedPerturbStage, fn_constructor_kwargs={"factors": factors},
        batch_format="pyarrow", batch_size=64,
        concurrency=(max(1, hi // 2), max(1, hi - 1)), num_cpus=1)
    out.write_parquet(args.out)
    print(f"wrote augmented clips (factors {factors}) -> {args.out}",
          file=sys.stderr)
    return 0


def run_query(args) -> int:
    from mail_deduplicate_ray.registry import queries
    reg = queries()
    if args.name in (None, "list"):
        for name in sorted(reg):
            print(name)
        return 0
    if args.name not in reg:
        import difflib
        near = difflib.get_close_matches(args.name, reg, n=3)
        hint = f"; did you mean {', '.join(near)}?" if near else ""
        raise ValueError(f"unknown query {args.name!r}{hint} "
                         "(run `query list` for the registry)")
    if not args.sf_dir:
        raise ValueError("--sf-dir is required to run a query")
    res = reg[args.name](args.sf_dir)
    import pandas as pd
    import pyarrow as pa
    import ray.data
    if args.out:
        if isinstance(res, pd.DataFrame):
            res = pa.Table.from_pandas(res, preserve_index=False)
        if isinstance(res, pa.Table):
            res = ray.data.from_arrow(res)
        res.write_parquet(args.out)
        print(f"wrote {args.name} -> {args.out}", file=sys.stderr)
        return 0
    if isinstance(res, ray.data.Dataset):
        head = res.limit(args.limit).to_pandas()
    elif isinstance(res, pa.Table):
        head = res.slice(0, args.limit).to_pandas()
    else:
        head = res.head(args.limit)
    print(head.to_string(index=False))
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    import os

    import ray
    owns_session = not ray.is_initialized()
    if owns_session:
        addr = args.ray_address or os.environ.get("RAY_ADDRESS", "local")
        # num_cpus only bounds a locally-started session; attaching to an
        # existing cluster takes the cluster's size as-is
        kw = {"num_cpus": args.num_cpus} if addr == "local" else {}
        ray.init(address=addr, include_dashboard=False,
                 logging_level="ERROR", **kw)
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    if args.cmd == "diff":
        rc = run_diff(args)
        if owns_session:
            ray.shutdown()
        return rc

    if args.cmd == "query":
        rc = run_query(args)
        if owns_session:
            ray.shutdown()
        return rc

    if args.cmd == "augment":
        rc = run_augment(args)
        if owns_session:
            ray.shutdown()
        return rc

    from mail_deduplicate_ray.config import DedupConfig
    from mail_deduplicate_ray.pipelines import actions, neardup
    from mail_deduplicate_ray.sources import read_clips

    over = dict(
        transcript_hash=args.hash_body,
        **({"key_columns": tuple(args.hash_columns.split(","))}
           if args.hash_columns else {}),
        size_threshold=args.size_threshold,
        content_threshold=args.content_threshold,
        strategies=tuple(args.strategy) or
        ("select-newest", "select-biggest", "select-one"),
        regexp=args.regexp,
        # only override when the flag was given — a TOML-configured
        # time_source must not be clobbered by the argparse default
        **({"time_source": args.time_source} if args.time_source else {}),
        **({"cc_method": args.cc_method} if args.cc_method else {}),
        dry_run=args.dry_run,
    )
    cfg = (DedupConfig.from_toml(args.config, **over) if args.config
           else DedupConfig(**over))
    # validate the export request up front: a typo'd codec must fail in
    # milliseconds, not as a RayTaskError after the whole dedup ran
    if args.export_sr and not args.export_codec:
        raise ValueError("--export-sr requires --export-codec")
    if args.action and args.export_codec:
        raise ValueError("--action and --export-codec are mutually "
                         "exclusive (transcode is its own export verb)")
    if args.action and not args.out and not args.dry_run:
        raise ValueError(f"--action {args.action} requires --out "
                         "(or --dry-run for counters only)")
    if args.allow_differing and args.action != "dedup-storage":
        raise ValueError("--allow-differing applies only to "
                         "--action dedup-storage")
    if args.append and (args.export_codec
                        or (args.action or "copy-selected").split("-")[0]
                        not in ("copy", "move")):
        raise ValueError("--append applies only to copy/move actions")
    if args.shards is not None:
        if args.shards < 1:
            raise ValueError("--shards must be >= 1")
        if (args.append or args.export_codec
                or (args.action or "copy-selected").split("-")[0] != "copy"):
            raise ValueError("--shards applies only to copy actions "
                             "(without --append / --export-codec)")
    if args.export_codec:
        from mail_deduplicate_ray import codecs as _codecs
        if args.export_codec not in _codecs.ENCODERS:
            raise ValueError(
                f"unknown --export-codec {args.export_codec!r}; "
                f"available: {sorted(_codecs.ENCODERS)}")
        if not args.out or args.dry_run:
            raise ValueError("--export-codec requires --out "
                             "(and is incompatible with --dry-run)")
    ds = read_clips(list(args.input))

    if args.hash_only:
        # canonical-field table first (≙ pretty_canonical_headers,
        # ref: cli.py:666-669 + mail.py:455-478)
        print("canonical fields (exact key components):", file=sys.stderr)
        for c in cfg.key_columns:
            print(f"  {c:<14} metadata", file=sys.stderr)
        print(f"  {'transcript':<14} {cfg.transcript_hash} hash "
              f"(--hash-body)", file=sys.stderr)
        sigs = neardup.clip_signatures(ds, cfg)
        for b in sigs.select_columns(
                ["clip_id", "exact_key", "rejected"]).iter_batches(
                batch_format="pyarrow"):
            for cid, key, rej in zip(b["clip_id"].to_pylist(),
                                     b["exact_key"].to_pylist(),
                                     b["rejected"].to_pylist()):
                print(f"{cid}\t{'REJECTED' if rej else key}")
        if owns_session:
            ray.shutdown()
        return 0

    res = neardup.dedup_clips(ds, cfg,
                              channels=tuple(args.channels.split(",")),
                              checkpoint_root=args.checkpoint_root)
    action = args.action
    if action is None and args.out and not args.export_codec:
        action = "copy-selected"  # the reference's default verb x target
    if args.export_codec and not args.dry_run:
        rep = actions.transcode_action(
            res, read_clips(list(args.input)), args.out,
            codec=args.export_codec, target_sr=args.export_sr)
        print(f"wrote {rep.rows} transcoded rows -> {rep.out_path}",
              file=sys.stderr)
    elif action:
        # verb x target routing (≙ OPERATIONS, ref: action.py:268-278);
        # dry-run still produces counters, no I/O (ref: action.py:66-72)
        if action == "dedup-storage":
            rep = actions.dedup_storage_action(
                res, args.out or "", allow_differing=args.allow_differing,
                dry_run=args.dry_run)
        else:
            verb, _, tgt = action.partition("-")
            target = {"selected": "selection", "discarded": "discard"}[tgt]
            fn = {"copy": actions.copy_action, "move": actions.move_action,
                  "delete": actions.delete_action}[verb]
            kw = {"append": args.append} if verb in ("copy", "move") else {}
            if verb == "copy" and args.shards:
                kw["shards"] = args.shards
            rep = fn(res, target, args.out or "", dry_run=args.dry_run,
                     **kw)
        verbed = ("would touch" if rep.dry_run else "wrote")
        dest = f" -> {rep.out_path}" if rep.out_path else ""
        print(f"{rep.action} {rep.target}: {verbed} {rep.rows} rows{dest}",
              file=sys.stderr)
    from mail_deduplicate_ray.stats import render_report
    print(render_report(res.stats, res.overflow_dropped, args.dry_run),
          file=sys.stderr)
    print(json.dumps({"stats": res.stats.to_dict(),
                      "overflow_dropped": res.overflow_dropped,
                      "dry_run": args.dry_run}))
    if owns_session:
        ray.shutdown()
    return 0


def cli() -> int:
    """main() with clean error reporting (≙ the reference's Click error
    handling, cli.py): user errors (bad config, duplicate sources, unknown
    strategies, missing files) print one line, not a traceback."""
    try:
        return main()
    except (ValueError, FileNotFoundError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    except KeyboardInterrupt:
        print("interrupted", file=sys.stderr)
        return 130


if __name__ == "__main__":
    sys.exit(cli())
