"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline on a deterministic synthetic
pages corpus derived from sf0.001.  ``queries()`` exposes every
implemented operator (SURVEY.md §2 + the training-data suite) as a
callable over ``sf_dir``; ``oracle_sql()`` gives the DuckDB-equivalent
SQL for every SQL-expressible one (same column names, so the driver's
order-insensitive value-hash matches).  KG-pipeline queries operate on a
synthesized Common-Crawl-style ``pages`` table (BASELINE.json
input_hint) that is not a registered DuckDB view, so they are
rows-only-checked; their correctness gate is the in-repo oracle replay
(tests/test_pipeline_e2e.py + tests/test_conformance.py).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import pathlib
from collections.abc import Callable
from typing import Any

# Synthetic KG corpus sizing per scale-factor directory (deterministic,
# cached under /tmp/promptner_corpus/<sf-name>).
_CORPUS_DOCS = {"sf0.001": 96, "sf0.01": 192, "sf0.1": 768}
_DEFAULT_DOCS = 192
KNN_QUERIES = 10
KNN_K = 10
COSINE_THRESHOLD = 0.4
JACCARD_THRESHOLD = 0.6


def _read(sf_dir: str, table: str):
    import ray

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet")


def _corpus_root(sf_dir: str) -> pathlib.Path:
    from promptner_ray.sources.corpus import ensure_corpus

    name = pathlib.Path(sf_dir).name
    n_docs = _CORPUS_DOCS.get(name, _DEFAULT_DOCS)
    return ensure_corpus(
        pathlib.Path("/tmp/promptner_corpus") / name,
        n_docs=n_docs,
        seed=42,
        sf_dir=sf_dir,
    )


def _pages(sf_dir: str):
    from promptner_ray.sources.corpus import read_pages

    return read_pages(_corpus_root(sf_dir))


def _kg_cfg():
    from promptner_ray.pipelines.kg import KGConfig

    return KGConfig(detect_concurrency=(1, 8))


def _kg_docs_text(sf_dir: str):
    from promptner_ray.pipelines import kg

    return kg.docs_text(_pages(sf_dir), _kg_cfg())


def _kg_sentences(sf_dir: str):
    from promptner_ray.pipelines import kg

    return kg.sentences(_kg_docs_text(sf_dir), _kg_cfg())


def _kg_detected(sf_dir: str):
    from promptner_ray.pipelines import kg

    cfg = _kg_cfg()
    return kg.detected(kg.sentences(kg.docs_text(_pages(sf_dir), cfg), cfg), cfg)


def _kg_mentions(sf_dir: str):
    from promptner_ray.pipelines import kg

    return kg.mentions(_kg_detected(sf_dir), _kg_cfg())


def _kg_triples(sf_dir: str):
    from promptner_ray.pipelines import kg

    return kg.triples(_kg_detected(sf_dir), _kg_cfg())


def _kg_links(sf_dir: str):
    from promptner_ray.pipelines import kg

    return kg.links(_kg_mentions(sf_dir))


def _kg_nodes(sf_dir: str):
    from promptner_ray.pipelines.kg import links_to_nodes

    return _kg_links(sf_dir).map_batches(
        links_to_nodes, batch_format="pyarrow"
    )


def _kg_edges(sf_dir: str):
    import ray

    from promptner_ray.pipelines import kg

    edges_ds = kg.edges(_kg_triples(sf_dir))
    nodes_df = _kg_nodes(sf_dir).select_columns(
        ["entity_id", "canonical"]
    ).to_pandas()  # small by construction (post-aggregate)
    names_ref = ray.put(
        dict(zip(nodes_df["entity_id"], nodes_df["canonical"]))
    )
    return kg.named_edges(edges_ds, names_ref)


def _kg_eval(sf_dir: str):
    """Triple P/R of the Ray pipeline vs the single-process oracle."""
    import pandas as pd

    from promptner_ray.pipelines.oracle import oracle_run, triple_prf

    name = pathlib.Path(sf_dir).name
    n_docs = _CORPUS_DOCS.get(name, _DEFAULT_DOCS)
    ref = oracle_run(n_docs, seed=42, sf_dir=sf_dir)
    got = [
        (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"])
        for r in _kg_triples(sf_dir).take_all()  # small synthetic corpus
    ]
    prf = triple_prf(got, ref["triples"])
    return pd.DataFrame(
        [
            {
                "precision": prf["precision"],
                "recall": prf["recall"],
                "f1": prf["f1"],
                "n_triples": len(got),
            }
        ]
    )


def _kg_typed_mentions(sf_dir: str):
    """Mentions after the optional second-pass type verification stage."""
    from promptner_ray.pipelines import kg
    from promptner_ray.stages.typecheck import verify_types

    return kg.mentions(verify_types(_kg_detected(sf_dir)), _kg_cfg())


def _kg_eval_f1(sf_dir: str):
    """Distributed span-F1 of detection vs the corpus gold annotations."""
    import pandas as pd
    import ray

    gold = ray.data.read_parquet(str(_corpus_root(sf_dir) / "gold"))
    from promptner_ray.pipelines.eval import evaluate_f1

    summary = evaluate_f1(_kg_detected(sf_dir), gold, num_partitions=8)
    return pd.DataFrame([summary])


def _knn_ivf(sf_dir: str):
    """IVF ANN: sample-trained centroids, ingest-time cell assignment,
    candidate-pruned top-k probe."""
    import ray

    from promptner_ray.functions import similarity

    cent_ref = ray.put(similarity.train_centroids(sf_dir))
    qref = ray.put(similarity.load_query_matrix(sf_dir, KNN_QUERIES))
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.knn_ivf(
        similarity.ivf_assign(emb, cent_ref), qref, cent_ref, k=KNN_K
    )


def _events_asof(sf_dir: str):
    import ray

    from promptner_ray.functions import asof

    idx_ref = ray.put(asof.load_orders_index(sf_dir))
    return asof.events_asof_orders(_read(sf_dir, "events"), idx_ref)


def entry() -> Any:
    """Flagship pipeline at sf0.001: pages → …→ named edge table."""
    return _kg_edges("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from promptner_ray.functions import (
        dedup,
        multimodal,
        relational,
        similarity,
        textstats,
    )

    def _docs(sf_dir: str):
        return _read(sf_dir, "documents")

    def _emb(sf_dir: str):
        return _read(sf_dir, "embeddings")

    def _qref(sf_dir: str):
        import ray

        return ray.put(similarity.load_query_matrix(sf_dir, KNN_QUERIES))

    def _mref(sf_dir: str):
        import ray
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return ray.put(similarity._batch_matrix(tbl))

    def _nation_ref(sf_dir: str):
        import ray
        import pyarrow.parquet as pq

        tbl = pq.read_table(f"{sf_dir}/nation.parquet")
        return ray.put(
            dict(
                zip(
                    tbl.column("n_nationkey").to_pylist(),
                    tbl.column("n_name").to_pylist(),
                )
            )
        )

    return {
        # --- text analysis (documents) -------------------------------
        "doc_token_stats": lambda sf: _docs(sf).map_batches(
            textstats.token_stats_batch, batch_format="pyarrow"
        ),
        "doc_fingerprint": lambda sf: _docs(sf).map_batches(
            textstats.fingerprint_batch, batch_format="pyarrow"
        ),
        "doc_quality": lambda sf: _docs(sf).map_batches(
            textstats.quality_batch, batch_format="pyarrow"
        ),
        "doc_tokens": lambda sf: _docs(sf).map_batches(
            textstats.explode_tokens_batch, batch_format="pyarrow"
        ),
        "doc_langid": lambda sf: _docs(sf).map_batches(
            textstats.langid_batch, batch_format="pyarrow"
        ),
        "doc_winnow": lambda sf: _docs(sf).map_batches(
            textstats.winnow_batch, batch_format="pyarrow"
        ),
        "lang_counts": lambda sf: relational.lang_counts(_docs(sf)),
        # --- dedup (documents) ---------------------------------------
        "dedup_exact": lambda sf: dedup.exact_dedup(_docs(sf)),
        "dedup_jaccard_pairs": lambda sf: dedup.jaccard_pairs(
            _docs(sf), threshold=JACCARD_THRESHOLD
        ),
        "dedup_minhash_lsh": lambda sf: dedup.minhash_lsh_pairs(_docs(sf)),
        "dedup_simhash": lambda sf: _docs(sf).map_batches(
            dedup.simhash_batch, batch_format="pyarrow"
        ),
        "dedup_simhash_pairs": lambda sf: dedup.simhash_pairs(_docs(sf)),
        # --- similarity search (embeddings) --------------------------
        "embed_knn": lambda sf: similarity.knn_topk(
            _emb(sf), _qref(sf), k=KNN_K
        ),
        "embed_cosine_pairs": lambda sf: similarity.cosine_pairs(
            _emb(sf), _mref(sf), threshold=COSINE_THRESHOLD
        ),
        "embed_knn_lsh": lambda sf: similarity.knn_lsh(
            _emb(sf), _qref(sf), k=KNN_K
        ),
        "embed_knn_ivf": _knn_ivf,
        # --- multimodal plumbing (documents-as-binary) ---------------
        "multimodal_features": lambda sf: multimodal.media_features(
            _docs(sf)
        ).select_columns(["doc_id", "n_bytes", "fp"]),
        "multimodal_decode": lambda sf: multimodal.media_features(_docs(sf)),
        # --- relational demos (TPC-H-ish tables) ---------------------
        "lineitem_stats": lambda sf: relational.lineitem_stats(
            _read(sf, "lineitem")
        ),
        "customer_nation_counts": lambda sf: relational.customer_nation_counts(
            _read(sf, "customer"), _nation_ref(sf)
        ),
        "events_tumbling": lambda sf: relational.events_tumbling(
            _read(sf, "events")
        ),
        "events_asof_orders": lambda sf: _events_asof(sf),
        "events_sessions": lambda sf: relational.events_sessions(
            _read(sf, "events")
        ),
        # --- KG pipeline (synthetic pages corpus; rows-only checks) --
        "kg_docs_text": _kg_docs_text,
        "kg_sentences": _kg_sentences,
        "kg_mentions": _kg_mentions,
        "kg_triples": _kg_triples,
        "kg_links": _kg_links,
        "kg_nodes": _kg_nodes,
        "kg_edges": _kg_edges,
        "kg_top_edges": lambda sf: _kg_edges(sf).sort(
            "weight", descending=True
        ).limit(50),
        "kg_eval": _kg_eval,
        "kg_eval_f1": _kg_eval_f1,
        "kg_typed_mentions": _kg_typed_mentions,
    }


def oracle_sql() -> dict[str, str]:
    stop_list = ", ".join(f"'{s}'" for s in _STOPWORDS())
    punct = r"[!-/:-@\[-`{-~]"
    markers = _LANG_MARKERS()
    mk = {
        lang: ", ".join(f"'{m}'" for m in ms) for lang, ms in markers.items()
    }
    shingles = """
        toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sh AS (
          SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
          FROM toks, UNNEST(generate_series(1, greatest(len(t)-2, 1))) AS g(i)
        )"""
    return {
        "doc_token_stats": (
            "SELECT doc_id, len(string_split(text,' '))::BIGINT AS n_tokens, "
            "length(text)::BIGINT AS n_chars FROM documents"
        ),
        "doc_fingerprint": "SELECT doc_id, md5(text) AS fp FROM documents",
        "doc_quality": f"""
            WITH base AS (
              SELECT doc_id,
                len(string_split(text,' '))::BIGINT AS n_tokens,
                length(text)::BIGINT AS n_chars,
                (length(text) - length(regexp_replace(text, '{punct}', '', 'g')))::BIGINT AS n_punct,
                len(list_filter(string_split(text,' '), x -> x IN ({stop_list})))::BIGINT AS n_stop
              FROM documents)
            SELECT doc_id, n_tokens, n_chars, n_punct, n_stop,
              CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars ELSE 0.0 END AS punct_ratio,
              CASE WHEN n_tokens > 0 THEN n_stop::DOUBLE / n_tokens ELSE 0.0 END AS stop_ratio,
              (n_tokens >= 5 AND n_tokens <= 5000
               AND (CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars ELSE 0.0 END) < 0.3
               AND (CASE WHEN n_tokens > 0 THEN n_stop::DOUBLE / n_tokens ELSE 0.0 END) < 0.5) AS passes
            FROM base
        """,
        "doc_tokens": (
            "SELECT doc_id, unnest(string_split(text,' ')) AS token "
            "FROM documents"
        ),
        "doc_langid": f"""
            WITH s AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
            sc AS (SELECT doc_id,
              len(list_filter(t, x -> x IN ({mk['en']}))) AS en,
              len(list_filter(t, x -> x IN ({mk['de']}))) AS de,
              len(list_filter(t, x -> x IN ({mk['fr']}))) AS fr,
              len(list_filter(t, x -> x IN ({mk['es']}))) AS es
            FROM s)
            SELECT doc_id,
              CASE WHEN en > 0 AND en >= de AND en >= fr AND en >= es THEN 'en'
                   WHEN de > 0 AND de >= fr AND de >= es THEN 'de'
                   WHEN fr > 0 AND fr >= es THEN 'fr'
                   WHEN es > 0 THEN 'es'
                   ELSE 'und' END AS lang_pred
            FROM sc
        """,
        "lang_counts": (
            "SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS fp, min(doc_id) AS doc_id, "
            "count(*)::BIGINT AS n_dups FROM documents GROUP BY md5(text)"
        ),
        "dedup_jaccard_pairs": f"""
            WITH {shingles},
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ninter
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   ninter::DOUBLE / (sa.n + sb.n - ninter) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE ninter::DOUBLE / (sa.n + sb.n - ninter) >= {JACCARD_THRESHOLD}
        """,
        "dedup_minhash_lsh": f"""
            WITH {shingles},
            mh AS (
              SELECT doc_id, i, min(md5(i::VARCHAR || ':' || s)) AS h
              FROM sh, UNNEST(generate_series(0, 11)) AS p(i)
              GROUP BY doc_id, i),
            bands AS (
              SELECT doc_id, i // 3 AS band,
                     string_agg(h, ',' ORDER BY i) AS sig
              FROM mh GROUP BY doc_id, i // 3)
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.sig = b.sig
                        AND a.doc_id < b.doc_id
        """,
        "embed_knn": f"""
            WITH q AS (SELECT vec_id AS qid, embedding AS qe
                       FROM embeddings WHERE vec_id < {KNN_QUERIES}),
            scored AS (
              SELECT q.qid, e.vec_id AS nid,
                row_number() OVER (
                  PARTITION BY q.qid
                  ORDER BY list_cosine_similarity(
                    q.qe::DOUBLE[], e.embedding::DOUBLE[]) DESC, e.vec_id
                ) AS rank
              FROM q, embeddings e WHERE e.vec_id != q.qid)
            SELECT qid, nid, rank FROM scored WHERE rank <= {KNN_K}
        """,
        "embed_cosine_pairs": f"""
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(
                    a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                  >= {COSINE_THRESHOLD}
        """,
        "multimodal_features": (
            "SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes, "
            "md5(text) AS fp FROM documents"
        ),
        "lineitem_stats": """
            SELECT l_returnflag, l_linestatus,
                   count(*)::BIGINT AS n_rows,
                   sum(l_quantity)::DOUBLE AS sum_qty,
                   min(l_quantity)::DOUBLE AS min_qty,
                   max(l_quantity)::DOUBLE AS max_qty
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "customer_nation_counts": """
            SELECT n.n_name, count(*)::BIGINT AS n_customers
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "events_tumbling": """
            SELECT user_id, date_trunc('hour', ts) AS window_start,
                   count(*)::BIGINT AS n_events
            FROM events GROUP BY user_id, date_trunc('hour', ts)
        """,
        "events_asof_orders": """
            SELECT e.event_id, e.user_id, o.o_orderdate AS order_ts
            FROM events e ASOF JOIN orders o
              ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        """,
        "events_sessions": """
            WITH marked AS (
              SELECT user_id, ts,
                CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                     OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            numbered AS (
              SELECT user_id, ts,
                sum(new_session) OVER (
                  PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS session_id
              FROM marked
            )
            SELECT user_id, min(ts) AS session_start,
                   count(*)::BIGINT AS n_events
            FROM numbered GROUP BY user_id, session_id
        """,
    }


def _STOPWORDS():
    from promptner_ray.functions.textstats import STOPWORDS

    return STOPWORDS


def _LANG_MARKERS():
    from promptner_ray.functions.textstats import LANG_MARKERS

    return LANG_MARKERS
