"""Hybrid classifier: pattern profile + AI profile merge.

Reference parity (hybrid_classifier.py:20-284, SURVEY.md §2.6):
- op29 bootstrap: AI enabled iff any provider key configured; the
  pattern engine (the Spark profiler) always runs — cheap-first.
- op30 consensus merge (:167-172, :201-221): types agree → key flags
  OR'd, PII max, AI meaning preferred, confidence min(0.95, avg + 0.1).
- op31 confidence arbitration (:174-199, thresholds :33-34): disagree →
  AI wins iff ai_conf >= 0.8; else pattern wins (with AI insights noted
  if pattern_conf >= 0.7); else pattern type with averaged confidence.
- op32 PII merge: ORDINAL severity max — deliberate fix of the
  reference's lexicographic-string max (`none` > `medium` > `low` >
  `high`), SURVEY.md §7.6 #1.
- op33 hybrid stats: merge-decision counters + percentages.
- op34 runtime toggle: enabling AI without providers refuses.

The merge is a pure function over two profile rows; on Spark it runs as
a driver-side post-pass over the (tiny) profile DataFrame — the heavy
lifting stays in the single-pass profiler.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from ai_data_pipeline_spark.classify.ai import AIClassifier
from ai_data_pipeline_spark.classify.providers import providers_from_env
from ai_data_pipeline_spark.profiling.patterns import PII_ORDER

AI_OVERRIDE_CONF = 0.8  # hybrid_classifier.py:33
PATTERN_TRUST_CONF = 0.7  # hybrid_classifier.py:34


def merge_pii(pattern_pii: str, ai_pii: str | None) -> str:
    """op32 with the ordinal fix: higher severity wins."""
    if ai_pii is None:
        return pattern_pii
    return max(pattern_pii, ai_pii, key=lambda x: PII_ORDER.get(x, 0))


def merge_profiles(pattern: dict[str, Any], ai: dict[str, Any] | None) -> dict[str, Any]:
    """ops 30-32: returns the merged profile dict + a `merge_decision`
    field in {pattern_only, consensus, ai_override, pattern_preferred}."""
    out = dict(pattern)
    if ai is None:
        out["merge_decision"] = "pattern_only"
        return out

    ai_type = ai.get("data_type")
    ai_conf = float(ai.get("confidence_score", 0.7))
    p_conf = float(pattern["confidence"])

    if ai_type == pattern["data_type"]:
        # op30 consensus: agreement boosts confidence
        out["confidence"] = min(0.95, (p_conf + ai_conf) / 2 + 0.1)
        out["is_primary_key"] = bool(
            pattern["is_primary_key"] or ai.get("is_primary_key", False)
        )
        out["pii_level"] = merge_pii(pattern["pii_level"], ai.get("pii_level"))
        if ai.get("business_meaning"):
            out["business_meaning"] = ai["business_meaning"]
        out["merge_decision"] = "consensus"
    elif ai_conf >= AI_OVERRIDE_CONF:
        # op31: confident AI overrides the pattern type
        out["data_type"] = ai_type
        out["confidence"] = ai_conf
        out["pii_level"] = merge_pii(pattern["pii_level"], ai.get("pii_level"))
        if ai.get("business_meaning"):
            out["business_meaning"] = ai["business_meaning"]
        out["data_quality_notes"] = "AI override of pattern classification"
        out["merge_decision"] = "ai_override"
    elif p_conf >= PATTERN_TRUST_CONF:
        out["pii_level"] = merge_pii(pattern["pii_level"], ai.get("pii_level"))
        if ai.get("business_meaning"):
            out["business_meaning"] = ai["business_meaning"]
        out["merge_decision"] = "pattern_preferred"
    else:
        out["confidence"] = (p_conf + ai_conf) / 2
        out["merge_decision"] = "pattern_preferred"
    return out


@dataclass
class HybridClassifier:
    """Flagship E3 path: Spark profiler (always) + AI refinement (when
    enabled), merged per column."""

    ai: AIClassifier | None = None
    stats: dict[str, int] = field(default_factory=dict)

    @classmethod
    def from_env(cls) -> "HybridClassifier":
        providers = providers_from_env()
        return cls(ai=AIClassifier(providers) if providers else None)

    @property
    def ai_enabled(self) -> bool:
        return self.ai is not None and self.ai.ai_enabled

    def set_ai_enabled(self, enabled: bool) -> bool:
        """op34: refuse to enable without a configured classifier."""
        if enabled and (self.ai is None or not self.ai.providers):
            return False
        if not enabled:
            self.ai = None
        return True

    def classify(self, profile_df: DataFrame) -> list[dict[str, Any]]:
        """Merge an AI pass into the profiler's output. The profile
        DataFrame is tiny (one row per column), so this is driver-side."""
        rows = [r.asDict() for r in profile_df.collect()]
        out = []
        for row in rows:
            ai_res = None
            if self.ai_enabled:
                ai_res = self.ai.classify_column(
                    row["column_name"],
                    (row.get("sample_values") or "").split(",")[:5],
                    row["total_rows"],
                    row["null_count"],
                    row["unique_count"],
                )
            merged = merge_profiles(row, ai_res)
            self.stats[merged["merge_decision"]] = (
                self.stats.get(merged["merge_decision"], 0) + 1
            )
            out.append(merged)
        return out

    def hybrid_stats(self) -> dict[str, Any]:
        """op33: decision counters + percentages."""
        total = sum(self.stats.values()) or 1
        return {
            **self.stats,
            **{
                f"{k}_pct": round(100.0 * v / total, 2)
                for k, v in self.stats.items()
            },
        }
