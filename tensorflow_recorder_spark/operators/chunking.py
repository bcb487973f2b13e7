"""Document chunking (E3/E6 extension): split long documents into
fixed-size token windows with configurable overlap — the standard
pre-tokenization step for context-window-bounded training and for
retrieval indexing (one embedding per chunk, not per document).

The reference has no notion of chunking (its rows are already
training-example-sized, /root/reference/tfrecorder/beam_pipeline.py);
at 100 TB the corpus is web documents whose length distribution is
heavy-tailed, and chunking is what bounds downstream per-row cost.

Scale shape: pure JVM-side expressions (split / sequence / slice /
posexplode) — map-only, no shuffle, no Python. Output size is
``ceil(n_tokens / stride)`` rows per document; there is no per-document
state, so the operator is embarrassingly parallel and survives any
scale-up. Skew note: a single pathological document produces
``n/stride`` chunks but they are generated inside one task without
materializing the token array more than once per row; pair with
``text.corpus_filter`` length caps upstream if single-row blowup is a
concern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _tokens_expr(text_col: str) -> str:
    # Shared token discipline with operators/text.py: lowercase-free
    # whitespace split, empties dropped (chunking must preserve case).
    return f"filter(split({text_col}, '\\\\s+'), t -> t <> '')"


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Explode each document into token-window chunks.

    Pinned semantics (deterministic, engine-reproducible):

    * tokens = whitespace-split, empty tokens dropped, case preserved;
    * chunk start positions are ``1, 1+stride, 1+2*stride, ...`` while
      ``start <= n_tokens`` — so consecutive chunks overlap by
      ``chunk_size - stride`` tokens and the final chunk may be shorter
      than ``chunk_size`` (it is never empty);
    * a document with zero tokens produces zero chunks.

    Output: (id, chunk_id 0-based, chunk_text, chunk_tokens) — one row
    per chunk. ``chunk_text`` re-joins the window with single spaces
    (original inter-token whitespace is normalized; document it
    downstream if byte-exact reconstruction matters).
    """
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    toks = _tokens_expr(text_col)
    starts = (
        f"CASE WHEN size({toks}) = 0 THEN array() "
        f"ELSE sequence(1, size({toks}), {stride}) END"
    )
    chunks = (
        f"transform({starts}, s -> "
        f"slice({toks}, s, {chunk_size}))"
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(F.expr(chunks)).alias("chunk_id", "__chunk"),
    )
    return out.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join("__chunk", " ").alias("chunk_text"),
        F.size("__chunk").cast("long").alias("chunk_tokens"),
    )


def chunk_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Corpus-level chunking report without materializing chunk text:
    per document, the number of chunks and total/boundary token counts —
    an arithmetic projection (no explode), so planners can size the
    downstream chunk table before producing it.

    Output: (id, n_tokens, n_chunks, last_chunk_tokens).
    """
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    toks = _tokens_expr(text_col)
    n = F.expr(f"size({toks})").cast("long")

    def n_chunks(nc: Column) -> Column:
        # starts while start <= n, start = 1 + i*stride  =>  i <= (n-1)/stride
        return F.when(nc <= 0, F.lit(0)).otherwise(
            F.floor((nc - 1) / F.lit(stride)) + 1
        ).cast("long")

    nc = n_chunks(n)
    last_start = (nc - 1) * F.lit(stride) + 1
    last_len = F.when(nc <= 0, F.lit(0)).otherwise(
        F.least(F.lit(chunk_size), n - last_start + 1)
    ).cast("long")
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        nc.alias("n_chunks"),
        last_len.alias("last_chunk_tokens"),
    )


def _buzhash_base_table() -> list[int]:
    """256 deterministic 32-bit values (one per byte-class) from a
    fixed-seed 64-bit LCG — the buzhash substitution table. Pinned
    constants: both the Spark expression and the DuckDB oracle SQL are
    rendered from THIS list, so the engines cannot drift."""
    vals, x = [], 0x9E3779B97F4A7C15
    for _ in range(256):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        vals.append((x >> 16) & 0xFFFFFFFF)
    return vals


def _rot32(v: int, k: int) -> int:
    k %= 32
    return ((v << k) | (v >> (32 - k))) & 0xFFFFFFFF if k else v


def buzhash_tables(window: int) -> list[list[int]]:
    """One pre-rotated table per window slot: ``tables[k][b] =
    rot32(T[b], k)``. The buzhash of the window ending at position p is
    ``XOR_k tables[k][code(p - k)]`` — per position, ``window`` O(1)
    array lookups and XORs; the rotation makes the hash position-
    sensitive inside the window (a plain XOR of table values would hash
    'ab' and 'ba' equally)."""
    base = _buzhash_base_table()
    return [[_rot32(v, k) for v in base] for k in range(int(window))]


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    divisor: int = 64,
    keep: list[str] | None = None,
    include_text: bool = False,
    hash_algo: str = "md5",
    engine: str = "arrow",
) -> DataFrame:
    """Content-defined chunking (FastCDC/rsync family): cut each
    document where the rolling hash of the trailing ``window`` chars is
    ``0 mod divisor`` — so boundaries depend only on LOCAL content and
    survive insertions/deletions elsewhere in the document (a
    fixed-size chunker would shift every downstream boundary). The
    storage-dedup primitive: near-identical documents (mirrors, edits,
    boilerplate wrappers) share most chunk hashes even when byte
    offsets differ.

    Expected chunk length is ``divisor`` chars; a boundary lands at
    position ``p`` (1-based, end-inclusive) when the BUZHASH of the
    window ending at ``p`` over the lowercased text is ``0 mod
    divisor``: ``XOR_{k=0..window-1} rot32(T[code(p-k)], k) % divisor
    == 0`` with ``code = codepoint % 256`` and ``T`` the pinned
    256-entry table (:func:`buzhash_tables`). A final cut at
    ``length(text)`` closes the last chunk. r9: this replaced the
    md5-of-window predicate — an O(window) digest per position, 22 s of
    the sf0.1 bench across the two CDC queries — with the O(1)-per-
    position table-lookup hash every real CDC deployment uses; the
    DuckDB oracle reproduces the same XOR-of-rotations bit-for-bit.

    Scale shape: one map-only pass — all arithmetic in JVM expressions
    (split/transform/sequence/filter/zip_with/posexplode), no shuffle,
    no Python. The per-char code array and the cut array are each
    bound ONCE per row via the single-element ``transform(array(x),
    v -> ...)[0]`` let-idiom: without it Catalyst's projection collapse
    inlines the O(len) scan into every downstream reference (once per
    chunk element) — measured 17 s vs <1 s on a 150 K-char corpus.
    The rotated tables are array LITERALS (constant-folded once, no
    per-row construction). Output: ``id_col, chunk_idx, chunk_len,
    chunk_hash`` (+``keep`` passthrough columns, +``chunk_text`` when
    requested). Empty documents produce zero rows.

    ``hash_algo`` picks the chunk CONTENT hash (the cut predicate is
    always buzhash): ``'md5'`` (default) is a 32-char hex string both
    engines reproduce byte-identically — required whenever chunk_hash
    VALUES feed an oracle (s36 derives HLL registers from the hex).
    ``'xxhash64'`` (r10) is Spark's JVM 64-bit hash as a LONG — for
    consumers whose OUTPUTS are hash-free aggregates (dedup ratios,
    stability counts), where only distinct-equality of the hash
    matters: the digest is ~3x cheaper than md5 and, more importantly
    at scale, every downstream distinct/join/groupBy shuffles an
    8-byte long instead of a 32-byte string key. Collision risk at the
    30x decade (~10M chunks): ~10M^2 / 2^65 ≈ 3e-6 expected colliding
    pairs — below any observable effect on the aggregate outputs.

    ``engine`` (r11 optimization round, guide §4.2 "native code in the
    UDF"): ``'arrow'`` (default for batch frames) computes the cut
    POSITIONS in a vectorized numpy pass — Spark higher-order lambdas
    are interpreted per element, so the per-character w-lookup XOR cost
    ~8 interpreted ``element_at`` evaluations per char; numpy does the
    same arithmetic as ``w`` table-gathers per BATCH over a UTF-32
    code-point view (exactly Spark's code-point ``split``/``ascii``
    semantics, probed and parity-tested incl. astral-plane chars).
    Lowercasing stays in the JVM (``F.lower``) so engine case-mapping
    can never drift, and the content hash + substring stay JVM-side —
    only integer span endpoints come back. ``'sql'`` is the original
    all-JVM expression (the parity reference); streaming frames always
    take it (the s36 twin's shape is pinned). Outputs are bit-identical
    (parity-tested on fixtures incl. empty/short/multibyte docs).
    """
    w, d = int(window), int(divisor)
    if hash_algo not in ("md5", "xxhash64"):
        raise ValueError(f"hash_algo must be 'md5' or 'xxhash64', got {hash_algo!r}")
    if w < 1 or w > 32:
        raise ValueError(f"window must be in [1, 32], got {window}")
    if engine not in ("arrow", "sql"):
        raise ValueError(f"engine must be 'arrow' or 'sql', got {engine!r}")
    if df.isStreaming:
        engine = "sql"
    # r11 (optimization round, guide §2.5 "input skew"): the boundary
    # predicate is O(chars) of JVM expression work per row, and a scan
    # with fewer input splits than cores serializes that entire pass
    # through one task (measured: the sf0.1 documents parquet is ONE
    # row group — each cdc pass ran as 1 task for ~2 s while 31 cores
    # idled). spread_to_parallelism is the repo's metadata-gated
    # spread: no-op whenever the scan already has >= cores files (so
    # at 100 TB no corpus-wide shuffle is ever added), a bounded
    # repartition otherwise; streaming frames pass through unchanged.
    if not df.isStreaming:
        from ..functions.partitioning import spread_to_parallelism

        df = spread_to_parallelism(df)
    keep_cols = list(keep or [])
    cols = [F.col(id_col)] + [F.col(c) for c in keep_cols]
    if engine == "arrow":
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        src = df.select(
            F.col(id_col),
            *[F.col(c) for c in keep_cols],
            F.col(text_col).alias("__txt"),
            # lowercase in the JVM — engine case-mapping can't drift
            F.lower(F.col(text_col)).alias("__lt"),
        )
        base_fields = [f for f in src.schema.fields if f.name != "__lt"]
        out_schema = T.StructType(
            list(base_fields)
            + [
                T.StructField("__ss", T.ArrayType(T.IntegerType())),
                T.StructField("__ee", T.ArrayType(T.IntegerType())),
            ]
        )
        tables_np = np.asarray(buzhash_tables(w), dtype=np.uint32)
        pow2 = d & (d - 1) == 0
        dmask, dmod = np.uint32(d - 1), np.uint32(d)
        base_names = [f.name for f in base_fields]
        ww = w

        def gen(batches):
            for pdf in batches:
                lts = ["" if t is None else t for t in pdf["__lt"]]
                # one UTF-32 view of the whole batch = Spark's
                # code-point split/ascii semantics, vectorized
                cps = np.frombuffer(
                    "".join(lts).encode("utf-32-le"), dtype="<u4"
                )
                codes = (cps & np.uint32(255)).astype(np.intp)
                h = tables_np[0][codes]
                for k in range(1, ww):
                    h[k:] ^= tables_np[k][codes[:-k]]
                cut = (
                    (h & dmask) == 0 if pow2 else (h % dmod) == 0
                )
                ss_col, ee_col = [], []
                off = 0
                for lt, txt in zip(lts, pdf["__txt"]):
                    llt = len(lt)
                    n_ch = 0 if txt is None else len(txt)
                    if n_ch <= 0:
                        ss_col.append([])
                        ee_col.append([])
                        off += llt
                        continue
                    if n_ch < ww:
                        cuts = [n_ch]
                    else:
                        hi = min(n_ch, llt)
                        pos = np.flatnonzero(
                            cut[off + ww - 1 : off + hi]
                        )
                        cuts = (pos + ww).tolist()
                        if not cuts or cuts[-1] != n_ch:
                            cuts.append(n_ch)
                    ss_col.append([1] + [e + 1 for e in cuts[:-1]])
                    ee_col.append(cuts)
                    off += llt
                data = {name: pdf[name] for name in base_names}
                data["__ss"] = pd.Series(ss_col, dtype="object")
                data["__ee"] = pd.Series(ee_col, dtype="object")
                yield pd.DataFrame(data)

        exploded = (
            src.mapInPandas(gen, schema=out_schema)
            .select(
                *cols,
                F.col("__txt"),
                F.posexplode(F.arrays_zip("__ss", "__ee")).alias(
                    "chunk_idx", "__sp"
                ),
            )
            .select(
                *cols,
                "__txt",
                "chunk_idx",
                F.col("__sp.__ss").alias("__s"),
                F.col("__sp.__ee").alias("__e"),
            )
        )
    else:
        n = f"length({text_col})"
        tables = buzhash_tables(w)
        lookups = " ^ ".join(
            f"element_at(array({','.join(str(v) for v in tables[k])}), "
            f"element_at(cs, p - {k}) + 1)"
            for k in range(w)
        )
        # the boundary test runs once per CHARACTER of the corpus — use
        # bit-ops where arithmetic allows (& instead of pmod/%; divisor
        # is a power of two in every shipped call site)
        is_cut = (
            f"({lookups}) & {d - 1} = 0"
            if d & (d - 1) == 0
            else f"({lookups}) % {d} = 0"
        )
        cuts = (
            f"CASE WHEN {n} >= {w} THEN "
            f"array_union(filter(sequence({w}, {n}), p -> "
            f"{is_cut}), array({n})) "
            f"WHEN {n} > 0 THEN array({n}) "
            f"ELSE array(-1) END"
        )
        codes = f"transform(split(lower({text_col}), ''), ch -> ascii(ch) & 255)"
        # spans from a cut array bound once: zip each cut with its
        # predecessor (0-prefixed shift), s = prev + 1, e = cut. The -1
        # sentinel (empty doc) zips to struct(s=1, e=-1) and is filtered.
        spans = (
            "filter(transform(array(transform(array({codes}), cs -> {cuts})[0]), "
            "ca -> zip_with(ca, concat(array(0), slice(ca, 1, size(ca) - 1)), "
            "(e, p) -> struct(p + 1 AS s, e AS e)))[0], sp -> sp.e >= sp.s)"
        ).format(
            codes=codes.replace("{", "{{").replace("}", "}}"),
            cuts=cuts.replace("{", "{{").replace("}", "}}"),
        )
        out = df.withColumn("__spans", F.expr(spans))
        exploded = out.select(
            *cols,
            F.col(text_col).alias("__txt"),
            F.posexplode("__spans").alias("chunk_idx", "__sp"),
        ).select(
            *cols,
            "__txt",
            "chunk_idx",
            F.col("__sp.s").alias("__s"),
            F.col("__sp.e").alias("__e"),
        )
    content = F.expr("substring(__txt, __s, __e - __s + 1)")
    chunk_hash = (
        F.md5(content) if hash_algo == "md5" else F.xxhash64(content)
    )
    return exploded.select(
        *[c for c in [id_col] + keep_cols],
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("__e") - F.col("__s") + 1).cast("long").alias("chunk_len"),
        chunk_hash.alias("chunk_hash"),
        *(
            [
                F.expr("substring(__txt, __s, __e - __s + 1)").alias(
                    "chunk_text"
                )
            ]
            if include_text
            else []
        ),
    )
