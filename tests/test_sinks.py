"""Sink round-trip tests: partitioned parquet, bucketed table, CSV, JSON."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_ingestion_s3_to_parquet_spark.sources.sinks import (
    write_bucketed_table,
    write_csv,
    write_json,
    write_parquet,
)


def test_partitioned_parquet_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_status")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_parquet(orders, out, partition_by=["o_orderstatus"])
    # hive layout on disk
    assert sorted(
        d for d in os.listdir(out) if d.startswith("o_orderstatus=")
    ) == ["o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"]
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    # partition pruning: filtering one status must scan only that dir
    plan = (
        back.where(F.col("o_orderstatus") == "F")._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "o_orderstatus=O" not in plan


def test_bucketed_table_join_skips_exchange(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed_table(
        orders, "orders_b", bucket_cols=["o_custkey"], n_buckets=4
    )
    write_bucketed_table(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b",
        bucket_cols=["o_custkey"],
        n_buckets=4,
    )
    j = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
    plan = j._jdf.queryExecution().executedPlan().toString()
    # co-bucketed join: no shuffle exchange in the physical plan
    assert "Exchange hashpartitioning" not in plan
    assert j.count() > 0
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    write_csv(nation, str(tmp_path / "nation_csv"))
    write_json(nation, str(tmp_path / "nation_json"))
    csv_back = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .csv(str(tmp_path / "nation_csv"))
    )
    json_back = spark.read.json(str(tmp_path / "nation_json"))
    assert csv_back.count() == 25
    assert json_back.count() == 25
    assert set(json_back.columns) == set(nation.columns)


def test_orc_sink_roundtrip_bit_exact(spark, sf_dir, tmp_path):
    # ORC preserves schema natively (unlike CSV/JSON text), so the
    # roundtrip must be exact at ROW level, schema included
    from data_ingestion_s3_to_parquet_spark.sources.sinks import write_orc

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    write_orc(nation, str(tmp_path / "nation_orc"))
    back = spark.read.orc(str(tmp_path / "nation_orc"))
    assert back.schema == nation.schema
    assert back.count() == 25
    assert back.exceptAll(nation).count() == 0
    assert nation.exceptAll(back).count() == 0


def test_text_format_roundtrip(spark, tmp_path):
    lines = spark.createDataFrame([("alpha",), ("beta",)], "value string")
    out = str(tmp_path / "lines_txt")
    lines.write.mode("overwrite").text(out)
    assert {r.value for r in spark.read.text(out).collect()} == {"alpha", "beta"}


def test_compact_parquet_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    from data_ingestion_s3_to_parquet_spark.sources.sinks import compact_parquet

    out = str(tmp_path / "fragmented")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.repartition(50).write.parquet(out)          # simulate tiny-file debris

    def parquet_files(p):
        return [
            os.path.join(d, f)
            for d, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        ]

    assert len(parquet_files(out)) == 50
    before = li.count()
    n = compact_parquet(spark, out, target_file_bytes=64 * 1024 * 1024)
    files = parquet_files(out)
    assert len(files) == n < 50
    after = spark.read.parquet(out)
    assert after.count() == before
    # same multiset of rows (spot-check an aggregate invariant)
    a = after.agg(F.sum("l_quantity"), F.count("*")).collect()[0]
    b = li.agg(F.sum("l_quantity"), F.count("*")).collect()[0]
    assert a == b


def test_compact_parquet_recovers_from_crashed_run(spark, sf_dir, tmp_path):
    # simulate every crash window: (a) stale tmp from a mid-write crash,
    # (b) stale old + missing path from a crash between the two renames
    # — a rerun must succeed and lose no rows either way
    import shutil

    from data_ingestion_s3_to_parquet_spark.sources.sinks import compact_parquet

    out = str(tmp_path / "data")
    li = spark.read.parquet(f"{sf_dir}/region.parquet")
    li.repartition(4).write.parquet(out)
    before = spark.read.parquet(out).count()

    # (a) leftover partial tmp next to an intact target
    shutil.copytree(out, out + "._compact_tmp")
    compact_parquet(spark, out, target_file_bytes=64 * 1024 * 1024)
    assert spark.read.parquet(out).count() == before
    assert not os.path.exists(out + "._compact_tmp")
    assert not os.path.exists(out + "._compact_old")

    # (b) crash between renames: target gone, complete old layout left
    os.rename(out, out + "._compact_old")
    compact_parquet(spark, out, target_file_bytes=64 * 1024 * 1024)
    assert spark.read.parquet(out).count() == before
    assert not os.path.exists(out + "._compact_old")


def test_manifest_table_compaction_has_no_existence_window(spark, sf_dir, tmp_path):
    # the object-store-safe lane: data is committed by an atomic
    # manifest-pointer swap, so the table resolves to a COMPLETE
    # generation at every instant — unlike the rename lane, there is
    # never a missing-path window
    from data_ingestion_s3_to_parquet_spark.sources.sinks import (
        compact_parquet,
        is_manifest_table,
        manifest_table_data_path,
        manifest_table_read,
        manifest_table_write,
    )

    root = str(tmp_path / "mtable")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(50)
    manifest_table_write(li, root)
    assert is_manifest_table(root)
    before = manifest_table_read(spark, root).count()
    assert before == li.count()
    gen1 = manifest_table_data_path(root)

    n = compact_parquet(spark, root, target_file_bytes=64 * 1024 * 1024)
    gen2 = manifest_table_data_path(root)
    assert gen2 != gen1 and not os.path.exists(gen1)   # old gen GC'd
    files = [
        f for _, _, fs in os.walk(gen2) for f in fs if f.endswith(".parquet")
    ]
    assert len(files) == n < 50
    after = manifest_table_read(spark, root)
    assert after.count() == before
    a = after.agg(F.sum("l_quantity"), F.count("*")).collect()[0]
    b = li.agg(F.sum("l_quantity"), F.count("*")).collect()[0]
    assert a == b


def test_manifest_table_recovers_from_crash_windows(spark, sf_dir, tmp_path):
    # every crash point leaves a readable table: (a) orphan generation
    # written but manifest not swapped -> readers still see the old
    # generation, next compact GCs the orphan; (b) stale manifest .tmp
    # from a crashed commit -> ignored and removed
    import shutil as sh

    from data_ingestion_s3_to_parquet_spark.sources.sinks import (
        compact_parquet,
        manifest_table_data_path,
        manifest_table_read,
        manifest_table_write,
    )

    root = str(tmp_path / "mtable")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    manifest_table_write(region.repartition(4), root)
    before = manifest_table_read(spark, root).count()

    # (a) crashed rewrite: orphan next-gen dir exists, manifest untouched
    cur = manifest_table_data_path(root)
    sh.copytree(cur, os.path.join(root, "gen-99999999"))
    # (b) crashed commit: stale manifest tmp
    with open(os.path.join(root, "_MANIFEST.tmp"), "w") as fh:
        fh.write("{\"current\": \"gen-99999999\"}")

    assert manifest_table_read(spark, root).count() == before  # old gen intact
    compact_parquet(spark, root, target_file_bytes=64 * 1024 * 1024)
    assert manifest_table_read(spark, root).count() == before
    leftovers = [n for n in os.listdir(root) if n.startswith("gen-")]
    assert len(leftovers) == 1                         # orphans GC'd
    assert not os.path.exists(os.path.join(root, "_MANIFEST.tmp"))


def test_read_evolving_parquet_unions_drifted_schemas(spark, tmp_path):
    # batch 1 has (id, a); batch 2 gains b and drops a — the merged
    # read exposes the union schema with nulls where a batch lacks a col
    from data_ingestion_s3_to_parquet_spark.sources.catalog import (
        read_evolving_parquet,
    )

    p1, p2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    spark.range(3).selectExpr("id", "id * 2 as a").write.parquet(p1)
    spark.range(3, 6).selectExpr("id", "id * 3 as b").write.parquet(p2)

    df = read_evolving_parquet(spark, p1, p2)
    assert sorted(df.columns) == ["a", "b", "id"]
    rows = {r.id: (r.a, r.b) for r in df.collect()}
    assert rows[0] == (0, None) and rows[4] == (None, 12)
    assert len(rows) == 6


def test_clustered_parquet_files_have_disjoint_key_ranges(spark, sf_dir, tmp_path):
    # range layout: per-file (min, max) of the cluster key must be
    # near-disjoint so parquet footer stats can prune scans; a hash
    # layout would give every file the full key range
    import pyarrow.parquet as pq

    from data_ingestion_s3_to_parquet_spark.sources.sinks import (
        write_clustered_parquet,
    )

    out = str(tmp_path / "clustered")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_clustered_parquet(orders, out, ["o_custkey"], n_files=6)

    ranges = []
    for d, _, fs in os.walk(out):
        for f in fs:
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(d, f))
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == "o_custkey"
                )
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # ranges sorted and non-overlapping

    # row preservation
    back = spark.read.parquet(out)
    assert back.count() == orders.count()


def test_manifest_time_travel_reads_retained_generations(spark, sf_dir, tmp_path):
    import pytest

    from data_ingestion_s3_to_parquet_spark.sources.sinks import (
        manifest_table_generations,
        manifest_table_read,
        manifest_table_write,
    )

    root = str(tmp_path / "tt_table")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    manifest_table_write(nation.where("n_regionkey = 0"), root, retain=2)
    manifest_table_write(nation.where("n_regionkey <= 1"), root, retain=2)
    manifest_table_write(nation, root, retain=2)

    gens = manifest_table_generations(root)
    assert gens == [2, 3]  # retain=2: current + one predecessor
    assert manifest_table_read(spark, root).count() == 25
    assert (
        manifest_table_read(spark, root, generation=2).count()
        == nation.where("n_regionkey <= 1").count()
    )
    # generation 1 was GC'd: time travel past retention fails loudly
    with pytest.raises(FileNotFoundError):
        manifest_table_read(spark, root, generation=1)


def test_zorder_write_prunes_on_both_columns(spark, sf_dir, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from data_ingestion_s3_to_parquet_spark.sources.sinks import (
        write_zorder_parquet,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = str(tmp_path / "events_z")
    write_zorder_parquet(events, out, ["user_id", "value"], n_files=8)

    back = spark.read.parquet(out)
    assert back.count() == events.count()
    assert set(back.columns) == set(events.columns)

    # per-file footer ranges on BOTH z-ordered columns
    ranges = {"user_id": [], "value": []}
    files = sorted(glob.glob(f"{out}/*.parquet"))
    assert len(files) > 2
    for f in files:
        meta = pq.ParquetFile(f).metadata
        for col in ranges:
            idx = meta.schema.names.index(col)
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            ranges[col].append((min(mins), max(maxs)))

    # z-order property: for EACH column, a narrow predicate intersects
    # only a strict subset of files (a single-key clustering would give
    # full-domain ranges on the second column -> zero pruning there)
    for col in ranges:
        glo_min = min(r[0] for r in ranges[col])
        glo_max = max(r[1] for r in ranges[col])
        width = glo_max - glo_min
        probe_lo = glo_min + width * 0.4
        probe_hi = glo_min + width * 0.45  # a 5%-of-domain range scan
        hit = sum(1 for lo, hi in ranges[col] if hi >= probe_lo and lo <= probe_hi)
        assert hit < len(files), col


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    # XML is a native format in Spark 4 — the engine covers it like
    # CSV/JSON/ORC for interchange parity
    from data_ingestion_s3_to_parquet_spark.sources.sinks import write_xml

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    out = str(tmp_path / "nation_xml")
    write_xml(nation, out, row_tag="nation")
    back = spark.read.option("rowTag", "nation").format("xml").load(out)
    assert back.count() == 25
    assert set(back.columns) == set(nation.columns)
    a = {r.n_nationkey: r.n_name for r in nation.collect()}
    b = {r.n_nationkey: r.n_name for r in back.collect()}
    assert a == b


def test_manifest_table_migrate_fresh_then_idempotent(spark, tmp_path):
    # ADVICE r5: migration claims (fresh migration, re-migration
    # idempotence) had no coverage
    from data_ingestion_s3_to_parquet_spark.sources.sinks import (
        is_manifest_table,
        manifest_table_migrate,
        table_read,
    )

    path = str(tmp_path / "t")
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    df.write.parquet(path)
    rows = {(r.id, r.v) for r in spark.read.parquet(path).collect()}

    # plain layout: table_read dispatches to the bare reader
    assert not is_manifest_table(path)
    assert {(r.id, r.v) for r in table_read(spark, path).collect()} == rows

    manifest_table_migrate(spark, path)
    assert is_manifest_table(path)
    # loose files gone, one committed generation remains
    loose = [n for n in os.listdir(path) if not n.startswith(("gen-", "_MANIFEST"))]
    assert loose == []
    # manifest layout: table_read dispatches through the pointer
    assert {(r.id, r.v) for r in table_read(spark, path).collect()} == rows

    # re-migration is a no-op (idempotent), not a double rewrite
    manifest_table_migrate(spark, path)
    assert {(r.id, r.v) for r in table_read(spark, path).collect()} == rows
    assert [n for n in os.listdir(path) if n.startswith("gen-")] == ["gen-00000001"]


def test_manifest_table_migrate_crash_retry_paths(spark, tmp_path):
    # ADVICE r5: the two documented crash windows must actually retry
    # clean — (a) mid-rewrite before commit, (b) between commit and
    # loose-file cleanup
    import shutil

    from data_ingestion_s3_to_parquet_spark.sources.sinks import (
        is_manifest_table,
        manifest_table_migrate,
        table_read,
    )

    # (a) crash mid-rewrite: partial gen dir exists, no _MANIFEST yet
    path_a = str(tmp_path / "a")
    df = spark.range(50).withColumn("v", F.col("id") + 7)
    df.write.parquet(path_a)
    rows = {(r.id, r.v) for r in spark.read.parquet(path_a).collect()}
    os.makedirs(os.path.join(path_a, "gen-00000001"))  # partial, unreadable
    with open(os.path.join(path_a, "gen-00000001", "part-junk.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    manifest_table_migrate(spark, path_a)  # retry completes
    assert is_manifest_table(path_a)
    assert {(r.id, r.v) for r in table_read(spark, path_a).collect()} == rows

    # (b) crash between commit and cleanup: manifest committed, loose
    # files still present — a retry finishes the removal and reads are
    # already consistent through the pointer the whole time
    path_b = str(tmp_path / "b")
    df.write.parquet(path_b)
    side = str(tmp_path / "side")
    shutil.copytree(path_b, side)  # preserve the loose files
    manifest_table_migrate(spark, path_b)
    # re-plant the loose files to simulate the crash-before-cleanup state
    for name in os.listdir(side):
        src = os.path.join(side, name)
        dst = os.path.join(path_b, name)
        if not os.path.exists(dst):
            (shutil.copytree if os.path.isdir(src) else shutil.copyfile)(src, dst)
    assert any(
        not n.startswith(("gen-", "_MANIFEST")) for n in os.listdir(path_b)
    )
    assert {(r.id, r.v) for r in table_read(spark, path_b).collect()} == rows
    manifest_table_migrate(spark, path_b)  # retry = cleanup only
    assert [
        n for n in os.listdir(path_b) if not n.startswith(("gen-", "_MANIFEST"))
    ] == []
    assert {(r.id, r.v) for r in table_read(spark, path_b).collect()} == rows


def test_write_parquet_tuned_zstd_and_bloom(spark, tmp_path):
    # zstd: footer codec metadata must say ZSTD and the data must
    # round-trip; bloom: enabling the filter on a key column must write
    # strictly more bytes than the identical no-bloom layout (the
    # bitsets live in the file) while reading back identically
    import glob

    import pyarrow.parquet as pq

    from data_ingestion_s3_to_parquet_spark.sources.sinks import (
        write_parquet_tuned,
    )

    df = spark.range(2000).withColumn("k", F.col("id") * 7).coalesce(1)
    rows = {(r.id, r.k) for r in df.collect()}

    zpath = str(tmp_path / "z")
    write_parquet_tuned(df, zpath, compression="zstd")
    f = glob.glob(f"{zpath}/*.parquet")[0]
    md = pq.ParquetFile(f).metadata
    assert md.row_group(0).column(0).compression == "ZSTD"
    assert {(r.id, r.k) for r in spark.read.parquet(zpath).collect()} == rows

    plain = str(tmp_path / "plain")
    bloom = str(tmp_path / "bloom")
    write_parquet_tuned(df, plain, compression="snappy")
    write_parquet_tuned(
        df, bloom, compression="snappy",
        bloom_columns=("k",), bloom_expected_ndv=2000,
    )
    size = lambda p: sum(
        __import__("os").path.getsize(x) for x in glob.glob(f"{p}/*.parquet")
    )
    assert size(bloom) > size(plain)  # the bitset is actually in the file
    assert {(r.id, r.k) for r in spark.read.parquet(bloom).collect()} == rows


def test_atomic_exchange_swaps_or_reports_unsupported(tmp_path):
    # renameat2(RENAME_EXCHANGE): both directories exist at every
    # instant; on filesystems without the flag the helper must return
    # False without touching anything
    from data_ingestion_s3_to_parquet_spark.sources.sinks import (
        _atomic_exchange,
    )

    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir()
    b.mkdir()
    (a / "x").write_text("A")
    (b / "y").write_text("B")
    swapped = _atomic_exchange(str(a), str(b))
    if swapped:
        assert sorted(p.name for p in a.iterdir()) == ["y"]
        assert sorted(p.name for p in b.iterdir()) == ["x"]
    else:  # unsupported filesystem: nothing moved
        assert sorted(p.name for p in a.iterdir()) == ["x"]
        assert sorted(p.name for p in b.iterdir()) == ["y"]


def test_compact_parquet_exchange_leaves_no_window_or_debris(
    spark, sf_dir, tmp_path
):
    # on a RENAME_EXCHANGE filesystem the plain-directory compactor
    # must never let the path vanish: the path exists before, after,
    # and (by the syscall's atomicity) at every instant in between;
    # afterwards no tmp/old debris remains. Also pin the
    # post-exchange-crash recovery: a leftover tmp holding the OLD
    # layout next to an intact target is discarded on the next run.
    import shutil

    from data_ingestion_s3_to_parquet_spark.sources.sinks import (
        _atomic_exchange,
        compact_parquet,
    )

    probe_a, probe_b = tmp_path / "pa", tmp_path / "pb"
    probe_a.mkdir()
    probe_b.mkdir()
    if not _atomic_exchange(str(probe_a), str(probe_b)):
        import pytest

        pytest.skip("filesystem lacks RENAME_EXCHANGE")

    out = str(tmp_path / "data")
    li = spark.read.parquet(f"{sf_dir}/region.parquet")
    li.repartition(4).write.parquet(out)
    before = spark.read.parquet(out).count()
    compact_parquet(spark, out, target_file_bytes=64 * 1024 * 1024)
    assert os.path.exists(out)
    assert spark.read.parquet(out).count() == before
    assert not os.path.exists(out + "._compact_tmp")
    assert not os.path.exists(out + "._compact_old")

    # crash simulated right after the exchange: tmp holds the old
    # (complete) layout, target is the new one — the rerun discards
    # the stale tmp and loses nothing
    shutil.copytree(out, out + "._compact_tmp")
    compact_parquet(spark, out, target_file_bytes=64 * 1024 * 1024)
    assert spark.read.parquet(out).count() == before
    assert not os.path.exists(out + "._compact_tmp")
