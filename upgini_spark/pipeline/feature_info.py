"""Features-info report assembly — the table `FeaturesEnricher` shows
after fit.

Reference: src/upgini/utils/feature_info.py:1-207 (FeatureInfo dataclass,
value-preview sampling, provider/source resolution, SHAP display
rounding) and features_enricher.py:4707-4836 (__prepare_feature_
importances: zero-SHAP skip, (-shap, name) ordering, drift-column drop
when all zero/null) with the resource-bundle display labels from
resource_bundle/strings.properties:259-272. The REST-backed
FeaturesMetadataV2 becomes a plain local dataclass; assembly is
driver-side pandas over per-feature scalars (the report is a handful of
rows), while hit rates come from one distributed aggregation
(:func:`hit_rates`)."""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LLM_SOURCE = "LLM with external data augmentation"

# resource_bundle/strings.properties:259-272
NAME_COL = "Feature name"
SHAP_COL = "SHAP value"
PSI_COL = "PSI value"
DRIFT_COL = "Adversarial Drift Score"
HITRATE_COL = "Coverage %"
PREVIEW_COL = "Value preview"
PROVIDER_COL = "Provider"
SOURCE_COL = "Source"
COMMERCIAL_COL = "Feature type"
UPDATE_COL = "Updates"


@dataclass
class FeatureMeta:
    """Local stand-in for FeaturesMetadataV2 (metadata.py) — only the
    fields the report consumes."""

    name: str
    shap_value: float = 0.0
    hit_rate: float | None = None
    psi_value: float | None = None
    drift_score: float | None = None
    update_frequency: str | None = None
    commercial_schema: str | None = None
    doc_link: str | None = None
    data_provider: str | None = None
    data_provider_link: str | None = None
    data_providers: list[str] = field(default_factory=list)
    data_provider_links: list[str] = field(default_factory=list)
    data_source: str | None = None
    data_source_link: str | None = None
    data_sources: list[str] = field(default_factory=list)
    data_source_links: list[str] = field(default_factory=list)


def _round_shap_value(shap: float) -> float:
    """feature_info.py:199-203: sub-0.0001 positives display AS 0.0001."""
    if shap >= 0.0 and shap < 0.0001:
        return 0.0001
    return round(shap, 4)


def _get_feature_sample(name: str, data: pd.DataFrame | None) -> str:
    """feature_info.py:104-120 exactly: RandomState(42) choice of 3 from
    the str-sorted uniques, floats rounded to 4, joined and truncated at
    30 chars."""
    if data is not None and len(data) > 0 and name in data.columns:
        if len(data) > 3:
            rand = np.random.RandomState(42)
            unique_values = sorted(data[name].dropna().unique(), key=str)
            feature_sample = rand.choice(unique_values, 3, replace=False).tolist()
        else:
            feature_sample = data[name].dropna().unique().tolist()
        if len(feature_sample) > 0 and isinstance(feature_sample[0], float):
            feature_sample = [round(f, 4) for f in feature_sample]
        feature_sample = ", ".join(str(f) for f in feature_sample)
        if len(feature_sample) > 30:
            feature_sample = feature_sample[:30] + "..."
    else:
        feature_sample = ""
    return feature_sample


def _to_anchor(link: str | None, value: str | None) -> str:
    if not value:
        return ""
    if not link or value == LLM_SOURCE:
        return value
    return f"<a href='{link}' target='_blank' rel='noopener noreferrer'>{value}</a>"


def _list_or_single(lst: list[str], single: str | None) -> list[str]:
    return lst or ([single] if single else [])


def _make_links(names: list[str], links: list[str]) -> str:
    return ",".join(
        _to_anchor(link, name) for name, link in itertools.zip_longest(names, links)
    )


def _get_internal_source(meta: FeatureMeta, is_client: bool, is_generated: bool) -> str:
    if is_generated:
        return "AutoFE: features from Training dataset"
    sources = _list_or_single(meta.data_sources, meta.data_source)
    if sources:
        return ", ".join(sources)
    if meta.data_source:
        return meta.data_source
    return (
        LLM_SOURCE
        if not meta.name.endswith("_country")
        and not meta.name.endswith("_postal_code")
        and not is_client
        else ""
    )


def _get_source(meta: FeatureMeta, is_client: bool, is_generated: bool) -> str:
    if is_generated:
        return "AutoFE: features from Training dataset"
    sources = _list_or_single(meta.data_sources, meta.data_source)
    links = _list_or_single(meta.data_source_links, meta.data_source_link)
    if sources:
        return _make_links(sources, links)
    return _get_internal_source(meta, is_client, is_generated)


def _get_provider(meta: FeatureMeta, is_client: bool) -> str:
    providers = _list_or_single(meta.data_providers, meta.data_provider)
    links = _list_or_single(meta.data_provider_links, meta.data_provider_link)
    if providers:
        return _make_links(providers, links)
    return "" if is_client else _to_anchor("https://upgini.com", "Upgini")


def _get_internal_provider(meta: FeatureMeta, is_client: bool) -> str:
    providers = _list_or_single(meta.data_providers, meta.data_provider)
    if providers:
        return ", ".join(providers)
    return "" if is_client else (meta.data_provider or "Upgini")


def build_features_info(
    metas: list[FeatureMeta],
    sample_data: pd.DataFrame | None = None,
    client_features: set[str] | frozenset[str] = frozenset(),
    generated_features: set[str] | frozenset[str] = frozenset(),
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Returns (features_info, features_info_without_links,
    internal_features_info) with the reference's exact ordering, rounding,
    skip, and column-drop rules."""
    metas = sorted(metas, key=lambda m: (-m.shap_value, m.name))
    rows, rows_nolinks, rows_internal = [], [], []
    seen: set[str] = set()
    for m in metas:
        if m.shap_value == 0.0 or m.name in seen:
            continue
        seen.add(m.name)
        is_generated = m.name in generated_features
        is_client = m.name in client_features and not is_generated
        shap = _round_shap_value(m.shap_value)
        preview = _get_feature_sample(m.name, sample_data)
        name_link = _to_anchor(m.doc_link, m.name) if m.doc_link else m.name
        base = {
            SHAP_COL: shap,
            PSI_COL: m.psi_value,
            DRIFT_COL: m.drift_score,
            HITRATE_COL: m.hit_rate,
            PREVIEW_COL: preview,
        }
        rows.append({
            NAME_COL: name_link, **base,
            PROVIDER_COL: _get_provider(m, is_client),
            SOURCE_COL: _get_source(m, is_client, is_generated),
            UPDATE_COL: m.update_frequency,
        })
        rows_nolinks.append({
            NAME_COL: m.name, **base,
            PROVIDER_COL: _get_internal_provider(m, is_client),
            SOURCE_COL: _get_internal_source(m, is_client, is_generated),
            UPDATE_COL: m.update_frequency,
        })
        rows_internal.append({
            NAME_COL: m.name, "feature_link": m.doc_link, **base,
            PROVIDER_COL: _get_internal_provider(m, is_client),
            "provider_link": m.data_provider_link,
            SOURCE_COL: _get_internal_source(m, is_client, is_generated),
            "source_link": m.data_source_link,
            COMMERCIAL_COL: m.commercial_schema or "",
            UPDATE_COL: m.update_frequency,
        })
    if not rows:
        empty = pd.DataFrame(columns=[NAME_COL, SHAP_COL, HITRATE_COL, PREVIEW_COL])
        return empty, empty.copy(), empty.copy()
    info = pd.DataFrame(rows)
    # drift column dropped when every value is 0/null (enricher :4822-4827)
    if info[DRIFT_COL].astype(np.float64).fillna(0.0).eq(0.0).all():
        info = info.drop(columns=[DRIFT_COL])
    return info, pd.DataFrame(rows_nolinks), pd.DataFrame(rows_internal)


def hit_rates(df: DataFrame, feature_cols: list[str]) -> dict[str, float]:
    """Coverage % per enriched feature — share of non-null rows, ONE
    aggregation for every feature (metadata.py:308-314 hit-rate
    convention: percent, 2dp)."""
    if not feature_cols:
        return {}
    row = df.agg(*[
        F.round(
            F.count(F.col("`" + c.replace("`", "``") + "`"))
            * 100.0 / F.count(F.lit(1)), 2
        ).alias(f"h{i}")
        for i, c in enumerate(feature_cols)
    ]).collect()[0]
    return {c: float(row[f"h{i}"]) for i, c in enumerate(feature_cols)}
