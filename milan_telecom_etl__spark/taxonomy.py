"""Machine-readable taxonomy tags for registry entries (VERDICT r12 #8).

Lives OUTSIDE every entry's import-closure on purpose (VERDICT r13 #1 /
ADVICE r13): the r13 taxonomy edit touched queries_registry.py — a
module in EVERY entry's closure — so gating.gate_order marked all 250
entries "this-round changed" and the driver's ~50-entry gate missed the
entries whose behavior actually changed. Entry modules must therefore
NEVER import this module; only tooling (scripts/gen_operators_md.py,
scripts/update_gates.py) and tests do, and the lazy QUERIES imports
below keep the dependency direction taxonomy -> registry.
tests/test_gating.py pins that this file is absent from every entry's
dep closure.

Default is the implementing module's family; CATEGORY_OVERRIDES tags
the cross-cutting postures (eval harnesses, standing-artifact/bucketed
serving entries, dedup machinery living outside registry_text).
scripts/gen_operators_md.py emits the tag; tests/test_docs.py pins
totality (every entry resolves) and freshness.
"""

from __future__ import annotations

MODULE_CATEGORY: dict[str, str] = {
    "queries_registry": "reference-parity",
    "registry_geo": "reference-parity",
    "registry_tpch": "tpch",
    "registry_analytics": "analytics",
    "registry_series": "timeseries",
    "registry_temporal": "timeseries",
    "registry_semistructured": "semistructured",
    "registry_quality": "llm-quality",
    "registry_sampling": "llm-sampling",
    "registry_text": "llm-text",
    "registry_similarity": "llm-ann",
    "registry_ml": "ml",
    "registry_streaming": "streaming",
}

_DEDUP_TEXT = {
    # registry_text's dedup surface (module default is llm-text)
    "containment_pairs", "cross_source_overlap", "dedup_cluster_profile",
    "dedup_index_compaction", "dedup_keep_best", "dedup_rate_report",
    "dedup_span_excise", "doc_fingerprint", "duplicate_span_islands",
    "duplicate_spans", "exact_dup_groups_plain",
    # (exact_dup_groups is tagged "serving" in CATEGORY_OVERRIDES —
    # do NOT also list it here: a duplicate dict key would silently
    # depend on literal ordering, r13 review)
    "incremental_containment", "incremental_dedup", "lsh_verified_pairs",
    "minhash_lsh_candidates", "minhash_lsh_sharp", "minhash_signatures",
    "near_dup_clusters", "ngram_jaccard_pairs", "setsim_prefix_join",
    "simhash", "winnowing_fingerprints",
    # decontamination = dedup-against-benchmark set machinery
    "bloom_decontamination", "decontamination_audit",
    "contamination_overlap_ratio", "split_leakage_audit",
    "memorization_attribution",
}

CATEGORY_OVERRIDES: dict[str, str] = {
    **{n: "llm-dedup" for n in _DEDUP_TEXT},
    # embedding-space dedup (module default llm-ann) + simhash banding
    # (module default llm-sampling)
    "embedding_near_dups": "llm-dedup",
    "embedding_near_dups_auto": "llm-dedup",
    "incremental_embedding_dedup": "llm-dedup",
    "semdedup_auto": "llm-dedup",
    "semdedup_keepers": "llm-dedup",
    "semantic_decontamination": "llm-dedup",
    "simhash_band_candidates": "llm-dedup",
    "simhash_band_candidates_auto": "llm-dedup",
    # eval harnesses (sampled-default discipline, *_full twins opt-in)
    "dedup_method_eval": "eval",
    "knn_method_eval": "eval",
    "knn_ivf_recall_curve": "eval",
    "knn_label_noise_audit": "eval",
    "lsh_s_curve": "eval",
    "matryoshka_eval": "eval",
    "quality_probe_eval": "eval",
    # standing-state serving entries (artifact store / bucketed
    # warehouse consumed by default; *_plain / *_train twins keep the
    # build price on the clock under their family tags)
    "incremental_dedup_serving": "serving",
    "knn_ivf_serving": "serving",
    "bucketed_order_revenue": "serving",
    "bucketed_user_sessions": "serving",
    "exact_dup_groups": "serving",
    "exact_dup_groups_appendable": "serving",
    "dedup_exact_keepers": "serving",
    "hll_partial_append_serving": "serving",
    "streaming_fertility_batch": "serving",
    "streaming_quality_probe_batch": "serving",
    # multimodal columns family (module default ml)
    "multimodal_decode_features": "multimodal",
    "multimodal_exact_dedup": "multimodal",
    "multimodal_frames": "multimodal",
    "multimodal_resize": "multimodal",
}


def category_of(name: str) -> str:
    """The entry's taxonomy tag. Raises KeyError for unknown entries
    or unmapped modules — totality is test-pinned."""
    if name in CATEGORY_OVERRIDES:
        return CATEGORY_OVERRIDES[name]
    from .queries_registry import QUERIES

    mod = QUERIES[name].__module__.split(".")[-1]
    return MODULE_CATEGORY[mod]


def categories() -> dict[str, str]:
    """name -> category for every driver-gated entry."""
    from .queries_registry import QUERIES

    return {n: category_of(n) for n in QUERIES}
