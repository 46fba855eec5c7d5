"""Persistent canonical catalog: bootstrap + incremental upsert.

Re-expresses ``reference/clean_canonical.py`` (SURVEY.md §2.1 S6, V10, V11,
§4.4) over DataFrames:

- first-run vs incremental branch (``reference/clean_canonical.py:296-338``)
  → ``bootstrap_canonical`` / ``upsert_canonical``
- direct-match short circuit: a member whose normalized name equals an
  existing ``canonical_member`` links without similarity
  (``reference/bivariate_comparison.py:98-136``, V11) → left_semi/left_anti
  split
- leader pinning: existing canonical leaders stay leaders of their group
  (``reference/bivariate_comparison.py:158-172``, V10)
- sequential canonical id assignment (``reference/clean_canonical.py:47-50,
  357``) → two-pass range-partitioned row numbering, NO single-partition
  global window (SURVEY.md §4.4): repartitionByRange gives ordered partition
  ids, per-partition counts give offsets, row_number runs inside each
  partition.

Table shapes follow FIXTURES.md F3:
  canonical_catalog(canonical_id, canonical_leader)
  canonical_links(item_uuid, item_name, canonical_id, canonical_leader,
                  canonical_member, agent_verified)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pin(df: DataFrame, catalog=None, stage: str = "pin") -> DataFrame:
    """Materialize ``df`` so later actions see EXACTLY these rows/partitions.

    Local fast path: ``localCheckpoint`` — blocks live unreplicated on
    executors, which is fine single-box but loses the job on executor death
    in a real cluster. When a ``SnapshotCatalog`` is supplied the pin routes
    through reliable storage instead (write_stage + read back — the Iceberg
    snapshot analog), making the two-pass id/cumsum pins and the CC frontier
    resumable; per-partition lineage lands in the manifest for free."""
    if catalog is None:
        return df.localCheckpoint()
    entry = catalog.write_stage(df, stage)
    return catalog.read_stage(stage, entry["snapshot_id"])


def assign_sequential_ids(
    df: DataFrame, order_cols: list[str], id_col: str, start: int = 1, catalog=None
) -> DataFrame:
    """Deterministic gap-free sequential ids without a global window.

    Two-pass (SURVEY.md §4.4): range-repartition on the order columns (range
    partition i holds keys strictly below partition i+1), count rows per
    partition, cumulative offsets via a tiny driver-side map (numPartitions
    entries — O(partitions), not O(rows)), then row_number within each
    partition.
    """
    n_part = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    # Pin the INPUT before range partitioning: the counts action and the
    # id-assignment action must see the SAME partition contents. Range
    # boundaries come from sampling, but RangePartitioner's sampling seeds
    # are a pure function of partition index — identical input partitions
    # (guaranteed by the pin) give identical boundaries in both jobs.
    # Pinning upstream of the range shuffle also means the (possibly
    # expensive) lineage above runs ONCE, not once per pass.
    df = pin(df, catalog, "pin_seqid_input")
    # ...and pin the RANGE PARTITIONING too: RangePartitioner samples with
    # RDD-id-derived seeds, so each action would otherwise draw different
    # boundaries — the counts below must describe the exact _pid labels the
    # id-assignment job reads (after this point _pid is frozen DATA, so the
    # groupBy/window below are correct under any later re-split).
    ranged = pin(
        df.repartitionByRange(n_part, *[F.col(c) for c in order_cols]).withColumn(
            "_pid", F.spark_partition_id()
        ),
        catalog,
        "pin_seqid_ranged",
    )
    counts = ranged.groupBy("_pid").count().collect()
    offsets = {}
    acc = start
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["count"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(id_col, F.row_number().over(w) - 1 + F.col("_offset"))
        .drop("_pid", "_offset")
    )


def ordered_cumsum(
    df: DataFrame, order_exprs: list, value_col: str, out_col: str, catalog=None
) -> tuple[DataFrame, float]:
    """Global running sum over a total order WITHOUT a single-partition
    window (SURVEY.md §4.4, same two-pass as assign_sequential_ids):
    range-partition on the order, cumsum within each partition, add the
    broadcast cumulative offset of all earlier partitions. Returns
    (df + out_col, grand_total). The driver-side state is O(partitions).

    order_exprs: sort expressions (e.g. [F.desc("rev"), F.asc("key")]) —
    must define a total order for a deterministic result.

    Float tolerance: doubles accumulate in a different association order
    (per-partition sums + offsets) than a sequential window sum, so a
    downstream round() sitting EXACTLY on a rounding boundary can differ
    from a sequential oracle by one ulp-step. Callers comparing against
    bit-exact harnesses (q_pareto_cumsum) round AFTER adding the offset —
    consistent with the oracle's post-sum rounding — and should prefer an
    epsilon/decimal comparison at larger scale factors where boundary
    collisions become likely.
    """
    n_part = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    # pin input partitions once (see assign_sequential_ids: deterministic
    # range boundaries + single evaluation of the upstream lineage)
    df = pin(df, catalog, "pin_cumsum_input")
    ranged = pin(  # pin sampled range boundaries across the two jobs
        df.repartitionByRange(n_part, *order_exprs).withColumn(
            "_pid", F.spark_partition_id()
        ),
        catalog,
        "pin_cumsum_ranged",
    )
    sums = ranged.groupBy("_pid").agg(F.sum(value_col).alias("_s")).collect()
    offsets, acc = {}, 0.0
    for row in sorted(sums, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["_s"] or 0.0
    off_df = df.sparkSession.createDataFrame(
        [(int(p), float(o)) for p, o in offsets.items()], "_pid int, _offset double"
    )
    w = Window.partitionBy("_pid").orderBy(*order_exprs).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.sum(value_col).over(w) + F.col("_offset"))
        .drop("_pid", "_offset")
    )
    return out, float(acc)


def bootstrap_canonical(groups: DataFrame, start_id: int = 1) -> tuple[DataFrame, DataFrame]:
    """First run (``reference/clean_canonical.py:296-336``): every group
    becomes a canonical entity; every member becomes a link.

    groups: (group_id, leader, member, item_uuid, item_name) — the groups
    table shape (``reference/groups_creation.py:292-294`` + back-prop map).
    Returns (canonical_catalog, canonical_links).
    """
    leaders = groups.select("group_id", "leader").distinct()
    catalog = assign_sequential_ids(leaders, ["leader"], "canonical_id", start_id).select(
        "canonical_id", F.col("leader").alias("canonical_leader"), "group_id"
    )
    links = (
        groups.join(catalog, "group_id")
        .select(
            "item_uuid",
            "item_name",
            "canonical_id",
            "canonical_leader",
            F.col("member").alias("canonical_member"),
            F.lit(0).alias("agent_verified"),
        )
        .dropDuplicates(["item_uuid", "canonical_id", "canonical_member"])
    )
    return catalog.drop("group_id"), links


def append_missing_members(
    catalog: DataFrame, links: DataFrame, missing: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """The appends_uuids flow end-to-end (reference/appends_uuids.py:122-144):

    1. normalize the missing items' names (nlp_regex_cleaning,
       ``appends_uuids.py:27-40``) → product_name
    2. drop items whose item_uuid is already linked (``:52-53``)
    3. U5 split on product_name ∈ links.canonical_member (``:55-58``)
    4. members NOT on canonical each become a catalog row with a fresh
       sequential id from max(canonical_id)+1 (``:64-81``). Bug-for-bug:
       duplicate product_names mint MULTIPLE catalog rows, and the links
       mapping resolves each name to its LAST (= max) id — the reference's
       dict(zip(leader, id)) last-wins overwrite (``:89,100``).
    5. members ON canonical link to the id their member name holds in the
       links table (``:96-97``); leader + agent_verified come from the
       catalog by id (``:108-113``).

    Documented deviation: the reference assigns new ids in input-file row
    order, which a distributed table does not have — ids here are assigned
    in sorted (product_name, item_uuid) order (deterministic total order).
    The member→id last-wins dict is likewise resolved as max(canonical_id)
    per name. Returns (catalog', links').
    """
    from product_deduplication_spark.functions.normalize import normalize_names

    if "agent_verified" not in catalog.columns:
        catalog = catalog.withColumn("agent_verified", F.lit(0).cast("long"))

    nlp = normalize_names(missing, "item_name").select(
        "item_uuid", "item_name", F.lower(F.trim("product_name")).alias("product_name")
    )
    # 2. uuids already linked are dropped entirely
    fresh = nlp.join(links.select("item_uuid"), "item_uuid", "left_anti")

    member_names = links.select(
        F.lower(F.trim("canonical_member")).alias("product_name")
    ).distinct()
    on_canon = fresh.join(member_names, "product_name", "left_semi")
    not_canon = fresh.join(member_names, "product_name", "left_anti")

    # 4. one catalog row PER missing row (duplicates included — reference
    # concat semantics), ids above the current max
    max_id = catalog.agg(F.coalesce(F.max("canonical_id"), F.lit(0))).collect()[0][0]
    minted = assign_sequential_ids(
        not_canon, ["product_name", "item_uuid"], "canonical_id", int(max_id) + 1
    )
    catalog2 = catalog.unionByName(
        minted.select(
            "canonical_id",
            F.col("product_name").alias("canonical_leader"),
            F.lit(0).cast("long").alias("agent_verified"),
        )
    )

    # last-wins leader→id map over the FULL appended catalog (new ids > old)
    leader_map = catalog2.groupBy("canonical_leader").agg(
        F.max("canonical_id").alias("canonical_id")
    )
    id_attrs = catalog2.select(
        "canonical_id", "canonical_leader", "agent_verified"
    ).dropDuplicates(["canonical_id"])

    new_not = (
        minted.drop("canonical_id")
        .join(leader_map, minted["product_name"] == leader_map["canonical_leader"])
        .select(
            "item_uuid",
            "item_name",
            "canonical_id",
            "canonical_leader",
            F.col("product_name").alias("canonical_member"),
            F.lit(0).cast("long").alias("agent_verified"),
        )
    )

    member_map = links.groupBy(
        F.lower(F.trim("canonical_member")).alias("product_name")
    ).agg(F.max("canonical_id").alias("canonical_id"))
    new_on = (
        on_canon.join(member_map, "product_name")
        .join(id_attrs, "canonical_id")
        .select(
            "item_uuid",
            "item_name",
            "canonical_id",
            "canonical_leader",
            F.col("product_name").alias("canonical_member"),
            "agent_verified",
        )
    )

    links2 = links.unionByName(new_on).unionByName(new_not)
    return catalog2, links2


def upsert_canonical(
    catalog: DataFrame, links: DataFrame, groups: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Incremental run (``reference/clean_canonical.py:338-418``).

    1. V11 direct match: members equal to an existing canonical_member link
       to that canonical_id immediately.
    2. V10 leader pinning: a group containing an existing canonical_leader
       adopts that leader + its canonical_id.
    3. Remaining groups get fresh sequential ids above max(canonical_id).
    Returns updated (catalog, links); links key-unique on (item_uuid,
    canonical_id, canonical_member) (invariant at
    ``reference/clean_canonical.py:207``).
    """
    member_index = links.select(
        F.col("canonical_member").alias("member"), "canonical_id", "canonical_leader"
    ).dropDuplicates(["member"])

    # 1. direct matches
    direct = groups.join(member_index, "member", "inner").select(
        "item_uuid",
        "item_name",
        "canonical_id",
        "canonical_leader",
        F.col("member").alias("canonical_member"),
        F.lit(0).alias("agent_verified"),
    )
    rest = groups.join(member_index, "member", "left_anti")

    # 2. leader pinning: group contains an existing canonical leader.
    # Detected over the FULL group membership (not just `rest`): a group
    # whose leader-member was itself a direct match must still pin its
    # remaining members to that canonical entity (V10 semantics,
    # reference/bivariate_comparison.py:158-172).
    leader_index = catalog.select(
        F.col("canonical_leader").alias("member"), "canonical_id", "canonical_leader"
    )
    pinned_candidates = groups.join(leader_index, "member", "inner")
    pinned_groups = (
        pinned_candidates.groupBy("group_id")
        .agg(F.min(F.struct("canonical_id", "canonical_leader")).alias("_c"))
        .select("group_id", F.col("_c.canonical_id"), F.col("_c.canonical_leader"))
    )
    pinned = rest.join(pinned_groups, "group_id").select(
        "item_uuid",
        "item_name",
        "canonical_id",
        "canonical_leader",
        F.col("member").alias("canonical_member"),
        F.lit(0).alias("agent_verified"),
    )
    fresh = rest.join(pinned_groups.select("group_id"), "group_id", "left_anti")

    # 3. new canonical entities, ids above current max
    max_id = catalog.agg(F.coalesce(F.max("canonical_id"), F.lit(0))).collect()[0][0]
    new_leaders = fresh.select("group_id", "leader").distinct()
    new_catalog = assign_sequential_ids(
        new_leaders, ["leader"], "canonical_id", int(max_id) + 1
    ).select("canonical_id", F.col("leader").alias("canonical_leader"), "group_id")
    new_links = fresh.join(new_catalog, "group_id").select(
        "item_uuid",
        "item_name",
        "canonical_id",
        "canonical_leader",
        F.col("member").alias("canonical_member"),
        F.lit(0).alias("agent_verified"),
    )

    out_catalog = catalog.unionByName(new_catalog.drop("group_id"))
    out_links = (
        links.unionByName(direct)
        .unionByName(pinned)
        .unionByName(new_links)
        .dropDuplicates(["item_uuid", "canonical_id", "canonical_member"])
    )
    return out_catalog, out_links
