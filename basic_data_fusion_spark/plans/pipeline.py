"""Declarative corpus-curation pipelines (TOML round-trip).

Extends the reference's query-parameter-document idiom
(reference: query/query_parameters.py:17-231 — a TOML file IS the query)
to the training-data domain: a TOML stage list IS the curation pipeline.
The spec compiles to the SAME lazy DataFrame chain a hand-written
pipeline produces (asserted against the hash-checked ``corpus_curation``
contract query), so a pipeline definition can be versioned, diffed and
shipped without touching code.

Stage vocabulary (each maps 1:1 onto an engine operator):

- ``exact_dedup``      — min-id keep per normalized content hash
- ``quality_filter``   — Gopher-style quality gate (``keep`` rows)
- ``lang_gate``        — language ID; optional ``langs`` whitelist
- ``pii_token_count``  — redact PII, project ``n_tokens_clean``
- ``hash_split``       — deterministic md5 train/val/test assignment

All stages are lazy narrow/one-shuffle transformations; composing them
changes nothing about the individual operators' scale shapes.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KNOWN = ("exact_dedup", "quality_filter", "lang_gate",
          "pii_token_count", "hash_split")


@dataclass
class CurationStage:
    kind: str
    langs: list[str] = field(default_factory=list)   # lang_gate only


@dataclass
class CurationSpec:
    stages: list[CurationStage] = field(default_factory=list)

    def to_toml(self) -> str:
        lines = []
        for st in self.stages:
            lines.append("[[stage]]")
            lines.append(f'kind = "{st.kind}"')
            if st.langs:
                inner = ", ".join(f'"{x}"' for x in st.langs)
                lines.append(f"langs = [{inner}]")
            lines.append("")
        return "\n".join(lines)

    @classmethod
    def from_toml(cls, text: str) -> "CurationSpec":
        doc = tomllib.loads(text)
        stages = []
        for st in doc.get("stage", []):
            kind = st.get("kind", "")
            if kind not in _KNOWN:
                raise ValueError(
                    f"unknown curation stage {kind!r}; known: {_KNOWN}")
            stages.append(CurationStage(kind=kind,
                                        langs=list(st.get("langs", []))))
        if not stages:
            raise ValueError("pipeline spec has no [[stage]] entries")
        return cls(stages=stages)


def build_curation_pipeline(docs: DataFrame, spec: CurationSpec) -> DataFrame:
    """Compile a :class:`CurationSpec` to a lazy DataFrame over a
    ``(doc_id, text, ...)`` corpus. Output columns accumulate per stage;
    the default 5-stage spec reproduces the hand-written flagship
    curation chain column-for-column (tested against its oracle)."""
    from basic_data_fusion_spark.functions.scalars import hash_split
    from basic_data_fusion_spark.operators.dedup import exact_dedup
    from basic_data_fusion_spark.operators.text import (
        detect_language,
        quality_score,
        redact_pii,
        token_count,
    )

    df = docs
    out_cols = ["doc_id"]
    for st in spec.stages:
        if st.kind == "exact_dedup":
            df = exact_dedup(df)
        elif st.kind == "quality_filter":
            cols_in = df.columns
            df = quality_score(df).filter("keep").select(*cols_in)
        elif st.kind == "lang_gate":
            df = (df.withColumn("detected_lang",
                                detect_language(F.col("text")))
                  .filter(F.col("detected_lang").isNotNull()))
            if st.langs:
                df = df.filter(F.col("detected_lang").isin(st.langs))
            out_cols.append("detected_lang")
        elif st.kind == "pii_token_count":
            df = df.withColumn(
                "n_tokens_clean",
                token_count(redact_pii(F.col("text"))))
            out_cols.append("n_tokens_clean")
        elif st.kind == "hash_split":
            df = df.withColumn("split", hash_split(F.col("doc_id")))
            out_cols.append("split")
        else:  # pragma: no cover - from_toml validates
            raise ValueError(f"unknown stage {st.kind!r}")
    return df.select(*out_cols)


DEFAULT_CURATION_TOML = """\
[[stage]]
kind = "exact_dedup"

[[stage]]
kind = "quality_filter"

[[stage]]
kind = "lang_gate"

[[stage]]
kind = "pii_token_count"

[[stage]]
kind = "hash_split"
"""
