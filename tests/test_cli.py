"""CLI surface: run report, --hash-only canonical table, duplicate-source
guard, --time-source (ref model: cli.py:571-686 behaviors)."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from mail_deduplicate_ray import synth
from mail_deduplicate_ray.__main__ import main
from mail_deduplicate_ray.sources.clips_io import check_sources


@pytest.fixture(scope="module")
def clips_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "clips.parquet"
    tbl, _ = synth.generate_clips(30, seed=5)
    pq.write_table(tbl, str(p))
    return str(p)


def test_report_and_stats_line(clips_file, capsys):
    # human report on stderr (≙ ref: cli.py:683-686), JSON stats on stdout
    assert main(["dedup", "--input", clips_file, "--dry-run"]) == 0
    cap = capsys.readouterr()
    assert "run report" in cap.err
    for field in ("mail_found", "mail_discarded", "set_total",
                  "overflow_dropped", "dry-run: no actions applied"):
        assert field in cap.err, field
    stats = json.loads(cap.out.strip().splitlines()[-1])
    assert stats["stats"]["mail_found"] > 0


def test_hash_only_prints_canonical_fields(clips_file, capsys):
    # ≙ pretty_canonical_headers (ref: cli.py:666-669 + mail.py:455-478)
    assert main(["dedup", "--input", clips_file, "--hash-only"]) == 0
    cap = capsys.readouterr()
    assert "canonical fields" in cap.err
    for col in ("sr_hz", "codec_norm", "dur_bucket", "transcript"):
        assert col in cap.err
    first = cap.out.strip().splitlines()[0].split("\t")
    assert len(first) == 2 and len(first[1]) == 128  # sha224 x2 + fp hex


def test_duplicate_source_is_hard_error(clips_file):
    # ≙ ref: deduplicate.py:936-956
    with pytest.raises(ValueError, match="duplicate input source"):
        main(["dedup", "--input", clips_file, "--input", clips_file,
              "--dry-run"])
    with pytest.raises(ValueError):
        check_sources([clips_file, clips_file])
    assert check_sources([clips_file]) == [clips_file]


def test_multiple_distinct_sources_union(clips_file, tmp_path, capsys):
    tbl, _ = synth.generate_clips(10, seed=9)
    ids = pa.array([f"second-{i}" for i in range(tbl.num_rows)], pa.string())
    tbl = tbl.set_column(tbl.schema.get_field_index("clip_id"),
                         "clip_id", ids)
    p2 = tmp_path / "clips2.parquet"
    pq.write_table(tbl, str(p2))
    assert main(["dedup", "--input", clips_file, "--input", str(p2),
                 "--dry-run"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n1 = pq.ParquetFile(clips_file).metadata.num_rows
    assert stats["stats"]["mail_found"] == n1 + tbl.num_rows


def test_time_source_none_falls_through(clips_file, capsys):
    # select-newest alone with time disabled -> every multi-row cluster
    # falls through to skipped_strategies; nothing crashes
    assert main(["dedup", "--input", clips_file, "--dry-run",
                 "--time-source", "none",
                 "--strategy", "select-newest"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["stats"].get("set_deduplicated", 0) == 0
    assert stats["stats"].get("set_skipped_strategies", 0) > 0


def test_clips_without_ingest_ts_dedup_ok():
    # ADVICE: a clips table lacking the optional ingest_ts column must run
    # (null-defaulted -> MissingTimestamps fall-through), not crash
    from mail_deduplicate_ray.config import DedupConfig
    from mail_deduplicate_ray.pipelines import neardup
    tbl, _ = synth.generate_clips(20, seed=2)
    tbl = tbl.drop_columns(["ingest_ts"])
    res = neardup.dedup_clips(ray.data.from_arrow(tbl), DedupConfig())
    res.stats.check()
    assert res.stats["mail_found"] == tbl.num_rows
    # time strategies all fell through; size/select-one still settle
    assert res.stats["set_deduplicated"] > 0


def test_cli_wrapper_clean_error(clips_file, capsys):
    from mail_deduplicate_ray.__main__ import cli
    import sys
    argv = sys.argv
    sys.argv = ["prog", "dedup", "--input", clips_file, "--input",
                clips_file, "--dry-run"]
    try:
        rc = cli()
    finally:
        sys.argv = argv
    assert rc == 2
    err = capsys.readouterr().err
    assert "error: duplicate input source" in err
    assert "Traceback" not in err


def test_toml_time_source_not_clobbered(tmp_path, clips_file, capsys):
    # a TOML [dedup] time_source survives when --time-source is not given
    cfg = tmp_path / "cfg.toml"
    cfg.write_text('[dedup]\ntime_source = "none"\n')
    assert main(["dedup", "--input", clips_file, "--dry-run",
                 "--config", str(cfg),
                 "--strategy", "select-newest"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # time disabled -> the lone time strategy falls through on every cluster
    assert stats["stats"].get("set_deduplicated", 0) == 0
    # and the CLI flag still wins when given
    assert main(["dedup", "--input", clips_file, "--dry-run",
                 "--config", str(cfg), "--time-source", "ingest_ts",
                 "--strategy", "select-newest"]) == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["stats"].get("set_deduplicated", 0) > 0


def test_diff_subcommand_pretty_labels(clips_file, capsys):
    # G5 pretty diff (ref: pretty_diff deduplicate.py:384-401)
    ids = pq.read_table(clips_file, columns=["clip_id"])["clip_id"].to_pylist()
    assert main(["diff", "--input", clips_file, ids[0], ids[3]]) == 0
    out = capsys.readouterr().out
    assert f"--- Normalized transcript of <Clip {ids[0]}>" in out
    assert f"+++ Normalized transcript of <Clip {ids[3]}>" in out
    # timestamp date fields rendered with 2 decimals
    assert "\t16" in out and ".00\n" in out
    # identical pair -> empty diff message
    assert main(["diff", "--input", clips_file, ids[0], ids[0]]) == 0
    assert "identical" in capsys.readouterr().out
    # unknown id -> clean ValueError
    with pytest.raises(ValueError, match="not found"):
        main(["diff", "--input", clips_file, ids[0], "no-such-clip"])


def test_export_transcode(tmp_path, small_corpus):
    import pyarrow.parquet as pq

    from mail_deduplicate_ray.__main__ import main

    tbl, _ = small_corpus
    src = tmp_path / "in.parquet"
    pq.write_table(tbl, src)
    out = tmp_path / "norm"
    rc = main(["dedup", "--input", str(src), "--out", str(out),
               "--export-codec", "pcm_s16le", "--export-sr", "8000"])
    assert rc == 0
    got = pq.read_table(out)
    ok = got.filter(got["transcoded"])
    assert ok.num_rows > 0
    assert set(ok["codec"].to_pylist()) == {"pcm_s16le"}
    assert set(ok["sr_hz"].to_pylist()) == {8000}


def test_export_flags_validated_eagerly(tmp_path, small_corpus):
    import pyarrow.parquet as pq
    import pytest as _pytest

    from mail_deduplicate_ray.__main__ import main

    tbl, _ = small_corpus
    src = tmp_path / "in.parquet"
    pq.write_table(tbl, src)
    with _pytest.raises(ValueError, match="unknown --export-codec"):
        main(["dedup", "--input", str(src), "--out", str(tmp_path / "o"),
              "--export-codec", "pcm16"])
    with _pytest.raises(ValueError, match="requires --export-codec"):
        main(["dedup", "--input", str(src), "--out", str(tmp_path / "o"),
              "--export-sr", "8000"])
    with _pytest.raises(ValueError, match="requires --out"):
        main(["dedup", "--input", str(src),
              "--export-codec", "pcm_s16le"])


def test_cli_checkpoint_resume_identical_results(tmp_path, small_corpus):
    """End-to-end CLI resume: a second run with the same
    --checkpoint-root reuses the signature/edge checkpoints and writes
    the identical kept set."""
    import json

    import pyarrow.parquet as pq

    from mail_deduplicate_ray.__main__ import main

    tbl, _ = small_corpus
    src = tmp_path / "in.parquet"
    pq.write_table(tbl, src)
    ck = tmp_path / "ck"

    def run(out_name):
        out = tmp_path / out_name
        rc = main(["dedup", "--input", str(src), "--out", str(out),
                   "--checkpoint-root", str(ck)])
        assert rc == 0
        t = pq.read_table(out)
        return sorted(t["clip_id"].to_pylist())

    first = run("o1")
    # checkpoint dirs now exist
    assert any(ck.rglob("manifest.json"))
    second = run("o2")
    assert first == second


# ---- CLI --action verb x target matrix (≙ ref Action enum
# action.py:281-339 routed from cli.py:477; test model: the reference's
# action matrix tests/test_action.py:82) ----

@pytest.mark.parametrize("action", [
    "copy-selected", "copy-discarded", "move-selected", "move-discarded",
    "delete-selected", "delete-discarded", "dedup-storage"])
def test_cli_action_matrix(tmp_path, clips_file, capsys, action):
    out = tmp_path / "out"

    # dry run first: counters produced, NO output dirs, input untouched
    before = open(clips_file, "rb").read()
    assert main(["dedup", "--input", clips_file, "--dry-run",
                 "--action", action]) == 0
    cap = capsys.readouterr()
    assert "would touch" in cap.err
    assert not out.exists()
    assert open(clips_file, "rb").read() == before

    # real run writes the routed artifact
    assert main(["dedup", "--input", clips_file, "--out", str(out),
                 "--action", action]) == 0
    cap = capsys.readouterr()
    stats = json.loads(cap.out.strip().splitlines()[-1])["stats"]
    verb = action.split("-")[0]
    # keep=True = everything not discarded (evicted mails stay in place,
    # ref: deduplicate.py:453 — eviction is not discard)
    n_sel = sum(stats.get(k, 0) for k in (
        "mail_selected", "mail_unique", "mail_skipped", "mail_evicted"))
    n_disc = stats.get("mail_discarded", 0)
    if action == "dedup-storage":
        # discarded rows -> (clip_id, blob_ref) links, byte-equality gated
        # (the gate may block all links; the manifest dir still lands)
        assert out.exists()
        files = sorted(out.glob("*.parquet"))
        if files:
            got = pq.read_table(out)
            assert set(got.column_names) == {"clip_id", "blob_ref"}
            assert got.num_rows <= n_disc
        return
    got = pq.read_table(out)
    if verb in ("copy", "move"):
        want = n_sel if action.endswith("selected") else n_disc
        assert got.num_rows == want
        assert "clip_id" in got.column_names and "keep" in got.column_names
        tomb = tmp_path / "out.tombstones"
        if verb == "move":  # move also emits the tombstone manifest
            assert pq.read_table(tomb).column_names == ["clip_id"]
            assert pq.read_table(tomb).num_rows == want
        else:
            assert not tomb.exists()
    else:  # delete -> tombstone manifest only
        want = n_sel if action.endswith("selected") else n_disc
        assert got.column_names == ["clip_id"]
        assert got.num_rows == want
    assert open(clips_file, "rb").read() == before  # source never mutated


def test_cli_action_flags_validated_eagerly(clips_file, tmp_path):
    with pytest.raises(ValueError, match="requires --out"):
        main(["dedup", "--input", clips_file, "--action", "move-selected"])
    with pytest.raises(ValueError, match="mutually exclusive"):
        main(["dedup", "--input", clips_file, "--out", str(tmp_path / "o"),
              "--action", "copy-selected", "--export-codec", "pcm_s16le"])
    with pytest.raises(ValueError, match="allow-differing"):
        main(["dedup", "--input", clips_file, "--dry-run",
              "--action", "copy-selected", "--allow-differing"])


def test_cli_append_with_export_codec_rejected(clips_file, tmp_path):
    with pytest.raises(ValueError, match="append applies only"):
        main(["dedup", "--input", clips_file, "--out", str(tmp_path / "o"),
              "--export-codec", "pcm_s16le", "--append"])


def test_cli_cc_method_star(clips_file, capsys):
    """--cc-method star routes connected components through star
    contraction end-to-end; stats invariants still hold."""
    assert main(["dedup", "--input", clips_file, "--dry-run",
                 "--cc-method", "star"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["stats"]["mail_found"] > 0
    with pytest.raises(SystemExit):  # argparse rejects unknown engines
        main(["dedup", "--input", clips_file, "--dry-run",
              "--cc-method", "bogus"])


def test_cli_query_runs_registry_ops(tmp_path, capsys):
    import pyarrow.parquet as pq
    sf = "/root/testdata/sf0.001"
    # list mode prints the full registry
    assert main(["query", "list"]) == 0
    names = capsys.readouterr().out.split()
    assert "exact_dedup_docs" in names and len(names) >= 100
    # print mode: head rows of any operator
    assert main(["query", "lang_adaptive_length_filter_docs",
                 "--sf-dir", sf, "--limit", "3"]) == 0
    assert "doc_id" in capsys.readouterr().out
    # parquet export mode
    out = tmp_path / "q"
    assert main(["query", "exact_dedup_docs", "--sf-dir", sf,
                 "--out", str(out)]) == 0
    t = pq.read_table(out)
    assert t.num_rows > 0 and "keeper_id" in t.schema.names
    # errors: unknown name suggests, missing --sf-dir explains
    with pytest.raises(ValueError, match="unknown query"):
        main(["query", "exact_dedup_doc", "--sf-dir", sf])
    with pytest.raises(ValueError, match="sf-dir"):
        main(["query", "exact_dedup_docs"])


def test_augment_subcommand_writes_clips_schema(tmp_path):
    import pyarrow.parquet as pq
    from mail_deduplicate_ray.__main__ import main
    from mail_deduplicate_ray import synth
    tbl, _ = synth.generate_clips(20, seed=5)
    src = tmp_path / "in.parquet"
    pq.write_table(tbl, str(src))
    out = tmp_path / "aug"
    rc = main(["augment", "--input", str(src), "--out", str(out),
               "--factors", "0.9,1.1", "--num-cpus", "4"])
    assert rc == 0
    got = pq.read_table(str(out))
    assert got.num_rows > 0 and got.num_rows % 2 == 0
    cols = set(got.column_names)
    assert {"clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript",
            "orig_clip_id", "factor_milli"} <= cols
    assert set(got["factor_milli"].to_pylist()) == {900, 1100}


def test_augment_rejects_bad_factors(tmp_path):
    import pytest
    from mail_deduplicate_ray.__main__ import main
    with pytest.raises(ValueError, match="factors"):
        main(["augment", "--input", "x.parquet", "--out", str(tmp_path),
              "--factors", "-1.0"])


def test_shards_flag_resumable_copy(tmp_path):
    import pyarrow.parquet as pq
    from mail_deduplicate_ray import synth
    from mail_deduplicate_ray.__main__ import main
    tbl, _ = synth.generate_clips(30, seed=7)
    src = tmp_path / "in.parquet"
    pq.write_table(tbl, str(src))
    out = tmp_path / "out"
    rc = main(["dedup", "--input", str(src), "--out", str(out),
               "--shards", "8", "--num-cpus", "4"])
    assert rc == 0
    marks = sorted(out.glob("shard=*/_SUCCESS"))
    assert marks, "sharded layout with _SUCCESS markers expected"
    kept = pq.read_table(str(out))
    assert kept.num_rows > 0 and "clip_id" in kept.column_names
    # second run over the same input: every shard skipped, nothing rewritten
    mt = {p: p.stat().st_mtime_ns
          for p in out.glob("shard=*/part-*.parquet")}
    rc = main(["dedup", "--input", str(src), "--out", str(out),
               "--shards", "8", "--num-cpus", "4"])
    assert rc == 0
    for p, m in mt.items():
        assert p.stat().st_mtime_ns == m


def test_shards_flag_validation(tmp_path):
    import pytest
    from mail_deduplicate_ray.__main__ import main
    with pytest.raises(ValueError, match="--shards applies only"):
        main(["dedup", "--input", "x.parquet", "--out", str(tmp_path),
              "--shards", "4", "--append"])
