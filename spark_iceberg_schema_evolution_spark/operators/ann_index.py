"""Materialized ANN index tables — similarity search that stops paying
the fit+encode cost per query.

``pq_topk``/``sq8_topk`` re-fit (PQ) and re-encode the WHOLE corpus on
every call; fine for one-off analytics, wrong for a serving corpus that
answers many top-k queries between ingests. This module applies the
signature-store pattern already proven for near-dedup
(``dedup.reconcile_signature_store``) to similarity search: the
codebook and the per-vector codes persist as lakehouse tables, ingest
appends encode ONLY the new vectors with the STORED codebook, and the
query path reads fixed-width code rows — at 100 TB the corpus'
full-precision vectors are touched only by the exact re-rank stage
(~k*refine rows per query).

Tables for index ``name``:

- ``{name}_codes``: PQ -> (id, pq_codes array<int>, vec_norm double);
  SQ8 -> (id, sq8_codes array<tinyint>, sq8_lo, sq8_scale double).
  Index parameters ride as table properties (``ann.kind``, ``ann.dim``,
  ``ann.m``, ``ann.ksub``, ``ann.seed``, ``ann.id_col``) so a sync or
  query with incompatible parameters raises instead of silently
  scoring garbage — the same no-silent-drift rule as the MinHash
  signature store.
- ``{name}_codebook`` (PQ only): (subspace, centroid, vec
  array<double>) — m*ksub tiny rows, collected to the driver at encode
  and query time (planning metadata, not data).

Reference scope note: the reference engine has no vector indexing at
all; this is §2.B extension surface built on the public
PQ (Jégou et al., TPAMI 2011) / SQ designs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_iceberg_schema_evolution_spark.operators.similarity import (
    _collect_fit_sample,
    _fit_subspace_codebooks,
    _pq_codes_col,
    _pq_score_topk,
    as_double,
    l2_norm,
    pca_expr,
    pca_fit,
    pca_project,
    sq8_encode,
    sq8_topk,
)

_PROPS = ("ann.kind", "ann.dim", "ann.m", "ann.ksub", "ann.seed",
          "ann.id_col")


def _props_for(kind, dim, m, ksub, seed, id_col, pca_k=0) -> dict:
    return {
        "ann.kind": kind,
        "ann.dim": str(dim),
        "ann.m": str(m),
        "ann.ksub": str(ksub),
        "ann.seed": str(seed),
        "ann.id_col": id_col,
        "ann.pca_k": str(pca_k),
    }


def _store_pca(catalog, spark, namespace: str, name: str, model: dict) -> None:
    spark_rows = [("mean", -1, model["mean"], None)] + [
        (
            "component",
            i,
            comp,
            float(model["explained_variance_ratio"][i]),
        )
        for i, comp in enumerate(model["components"])
    ]
    catalog.write_evolving(
        spark.createDataFrame(
            spark_rows,
            "row_type string, idx int, vec array<double>, evr double",
        ),
        namespace,
        f"{name}_pca",
    )


def _load_pca(catalog, namespace: str, name: str, k: int) -> dict:
    rows = (
        catalog.table(namespace, f"{name}_pca")
        .read()
        .collect()  # k+1 rows of planning metadata, never data-sized
    )
    mean = None
    comps: list = [None] * k
    evr: list = [0.0] * k
    for r in rows:
        if r["row_type"] == "mean":
            mean = list(r["vec"])
        else:
            comps[r["idx"]] = list(r["vec"])
            evr[r["idx"]] = r["evr"]
    if mean is None or any(c is None for c in comps):
        raise ValueError(f"PCA table {name}_pca is incomplete")
    return {
        "mean": mean,
        "components": comps,
        "explained_variance_ratio": evr,
    }


def _load_props(codes_t, namespace: str, name: str) -> dict:
    props = codes_t.properties()
    missing = [p for p in _PROPS if p not in props]
    if missing:
        raise ValueError(
            f"{namespace}.{name}_codes lacks ANN properties {missing}; "
            "not an ann_index table (or built before build_ann_index)"
        )
    return props


def _load_codebooks(catalog, namespace: str, name: str, m: int, ksub: int):
    rows = (
        catalog.table(namespace, f"{name}_codebook")
        .read()
        .collect()  # m*ksub rows of planning metadata, never data-sized
    )
    books = [[None] * ksub for _ in range(m)]
    for r in rows:
        books[r["subspace"]][r["centroid"]] = list(r["vec"])
    if any(c is None for b in books for c in b):
        raise ValueError(f"codebook table {name}_codebook is incomplete")
    return books


def build_ann_index(
    catalog,
    namespace: str,
    name: str,
    vectors: DataFrame,
    dim: int,
    kind: str = "pq",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    fit_fraction: float | None = None,
    max_fit_rows: int = 100_000,
    pca_k: int = 0,
) -> int:
    """Fit (PQ) / derive (SQ8) the index model and materialize codes
    for every vector in ``vectors``. The PQ fit uses the identical
    bounded-sample discipline as ``pq_topk`` (same sample, same seed),
    so an index built from a corpus and a fresh ``pq_topk`` over that
    corpus produce the SAME codes — pinned by the equivalence test.
    Returns the number of rows encoded.

    ``pca_k > 0`` adds the FAISS-style PCA pre-transform: a basis is
    fitted on the same bounded sample, stored in ``{name}_pca``, and
    the codes quantize the REDUCED vectors (PQ subspaces then split
    ``pca_k`` dims; SQ8 codes are pca_k bytes). Queries are reduced
    through the stored basis inside the approximate pass; the exact
    re-rank stage still runs on the ORIGINAL full vectors."""
    if kind not in ("pq", "sq8"):
        raise ValueError(f"unknown ANN index kind {kind!r}")
    codes_name = f"{name}_codes"
    if catalog.table(namespace, codes_name).exists():
        raise ValueError(
            f"index {namespace}.{name} already exists; use "
            "sync_ann_index to encode new vectors"
        )
    pca_model = None
    if pca_k:
        pca_model = pca_fit(
            vectors, vec_col, k=pca_k, max_fit_rows=max_fit_rows
        )
        _store_pca(
            catalog, vectors.sparkSession, namespace, name, pca_model
        )
        vectors = pca_project(
            vectors, pca_model, vec_col, "__pca"
        ).select(F.col(id_col), F.col("__pca").alias(vec_col))
        dim = pca_k
    c = vectors.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("__cv")
    )
    if kind == "pq":
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m {m}")
        fit_df = c.sample(fit_fraction, seed=seed) if fit_fraction else c
        fit_df = fit_df.limit(max_fit_rows)
        codebooks = _fit_subspace_codebooks(
            _collect_fit_sample(fit_df), dim, m, ksub, seed
        )
        spark = vectors.sparkSession
        cb_rows = [
            (j, i, vec)
            for j, book in enumerate(codebooks)
            for i, vec in enumerate(book)
        ]
        catalog.write_evolving(
            spark.createDataFrame(
                cb_rows, "subspace int, centroid int, vec array<double>"
            ),
            namespace,
            f"{name}_codebook",
        )
        encoded = c.select(
            id_col,
            _pq_codes_col(codebooks, dim, F.col("__cv")).alias("pq_codes"),
            l2_norm(F.col("__cv")).alias("vec_norm"),
        )
    else:
        encoded = sq8_encode(vectors, id_col=id_col, vec_col=vec_col)
    catalog.write_evolving(encoded, namespace, codes_name)
    codes_t = catalog.table(namespace, codes_name)
    codes_t.set_properties(
        _props_for(kind, dim, m, ksub, seed, id_col, pca_k)
    )
    return codes_t.row_count()


def sync_ann_index(
    catalog,
    namespace: str,
    name: str,
    vectors: DataFrame,
    vec_col: str = "embedding",
) -> int:
    """Incremental encode: append codes for exactly the ids in
    ``vectors`` missing from the codes table, using the STORED model —
    no re-fit, no corpus re-encode, idempotent under replay (the
    anti-join drops already-encoded ids). Pass the new batch per
    ingest, or the whole corpus to heal a crash gap — cost is one
    column-pruned id anti-join + encode work proportional to the
    missing rows, the same reconcile discipline as the MinHash
    signature store. Returns rows appended.

    PQ caveat, stated loudly: the codebook is FROZEN at build time. If
    the vector distribution drifts, measure recall on a recent sample
    and rebuild when it degrades — appending with a stale codebook
    degrades quietly, rebuilds are cheap (bounded fit + one corpus
    encode pass)."""
    codes_t = catalog.table(namespace, f"{name}_codes")
    if not codes_t.exists():
        raise ValueError(
            f"index {namespace}.{name} does not exist; build_ann_index "
            "first"
        )
    props = _load_props(codes_t, namespace, name)
    kind, id_col = props["ann.kind"], props["ann.id_col"]
    dim = int(props["ann.dim"])
    new = vectors.join(
        codes_t.read().select(id_col), id_col, "left_anti"
    )
    pca_k = int(props.get("ann.pca_k", "0"))
    if pca_k:
        model = _load_pca(catalog, namespace, name, pca_k)
        new = pca_project(new, model, vec_col, "__pca").select(
            F.col(id_col), F.col("__pca").alias(vec_col)
        )
    if kind == "pq":
        codebooks = _load_codebooks(
            catalog, namespace, name,
            int(props["ann.m"]), int(props["ann.ksub"]),
        )
        encoded = new.select(
            F.col(id_col),
            _pq_codes_col(
                codebooks, dim, as_double(F.col(vec_col))
            ).alias("pq_codes"),
            l2_norm(as_double(F.col(vec_col))).alias("vec_norm"),
        )
    else:
        encoded = sq8_encode(new, id_col=id_col, vec_col=vec_col)
    encoded = encoded.persist()
    try:
        n = encoded.count()
        if n:
            codes_t.append(encoded)
    finally:
        encoded.unpersist()
    return n


def ann_index_topk(
    catalog,
    namespace: str,
    name: str,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    refine: int = 4,
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine against the MATERIALIZED index: the approximate
    pass scans only the fixed-width codes table (PQ: ADC lookups
    against the stored codebook; SQ8: affine decode), then the top
    ``k*refine`` survivors re-rank exactly against ``corpus``'s full
    vectors — the only stage touching them. Same plan shape as
    ``pq_topk``/``sq8_topk`` minus the per-call fit+encode of the
    whole corpus."""
    codes_t = catalog.table(namespace, f"{name}_codes")
    if not codes_t.exists():
        raise ValueError(f"index {namespace}.{name} does not exist")
    props = _load_props(codes_t, namespace, name)
    kind, id_col = props["ann.kind"], props["ann.id_col"]
    dim = int(props["ann.dim"])
    pca_k = int(props.get("ann.pca_k", "0"))
    q_transform = None
    if pca_k:
        model = _load_pca(catalog, namespace, name, pca_k)
        q_transform = lambda col: pca_expr(model, col)  # noqa: E731
    if kind == "sq8":
        return sq8_topk(
            codes_t.read(), corpus, queries,
            k=k, refine=refine, corpus_id=id_col, query_id=query_id,
            vec_col=vec_col, q_transform=q_transform,
        )
    codebooks = _load_codebooks(
        catalog, namespace, name,
        int(props["ann.m"]), int(props["ann.ksub"]),
    )
    encoded = codes_t.read().select(
        F.col(id_col),
        F.col("pq_codes").alias("__codes"),
        F.col("vec_norm").alias("__xn"),
    )
    corpus_vecs = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("__cv")
    )
    return _pq_score_topk(
        encoded, codebooks, dim, corpus_vecs, queries,
        k=k, refine=refine, corpus_id=id_col, query_id=query_id,
        vec_col=vec_col, q_transform=q_transform,
    )
