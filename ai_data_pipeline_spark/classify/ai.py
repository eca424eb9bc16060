"""AI classifier: prompt building, provider fallback chain, response
parsing, and AI-profile construction.

Reference parity (reconstructed where the snapshot is truncated —
ai_classifier.py ends mid-function at line 221; SURVEY.md §2.5):
- op23 prompt build (ai_classifier.py:137-167): name + sample values +
  stats → strict-JSON instruction over the 9 types / 4 PII levels.
- op24 provider fallback (ai_classifier.py:116-135): fixed priority,
  advance on exception, None when all fail.
- op26 response parse (ai_classifier.py:211-221 + test contract
  test_classifiers.py:187-213): strip ``` fences, json.loads, graceful
  None on invalid JSON.
- op27 profile construction (call-site contract ai_classifier.py:57-76):
  AI result → profile with its confidence (default 0.7); no AI → basic
  profile with confidence 0.5.
- op28 provider attribution: per-provider success counters.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from ai_data_pipeline_spark.classify.providers import Provider

VALID_TYPES = {
    "identifier", "business_key", "date", "numeric", "text",
    "boolean", "email", "phone", "address",
}
VALID_PII = {"none", "low", "medium", "high"}


def build_prompt(
    column_name: str,
    sample_values: list[str],
    total_rows: int,
    null_count: int,
    unique_count: int,
) -> str:
    """op23: one prompt per column; the LLM sees ≤5 samples + stats."""
    samples = ", ".join(repr(s) for s in sample_values[:5])
    return f"""Analyze this database column and classify it.

Column name: {column_name}
Sample values: [{samples}]
Total rows: {total_rows}
Null count: {null_count}
Unique count: {unique_count}

Respond with ONLY a JSON object (no prose) with these keys:
  "data_type": one of identifier|business_key|date|numeric|text|boolean|email|phone|address
  "confidence_score": number 0..1
  "is_primary_key": boolean
  "pii_level": one of none|low|medium|high
  "business_meaning": short string
  "suggested_name": snake_case string
"""


def parse_response(text: str) -> dict[str, Any] | None:
    """op26: strip markdown fences, parse JSON, validate shape; None on
    any failure (graceful degradation, test_classifiers.py:207-213)."""
    if not text:
        return None
    s = text.strip()
    if s.startswith("```json"):
        s = s[7:]
    elif s.startswith("```"):
        s = s[3:]
    if s.endswith("```"):
        s = s[:-3]
    try:
        obj = json.loads(s.strip())
    except (json.JSONDecodeError, ValueError):
        return None
    if not isinstance(obj, dict):
        return None
    if obj.get("data_type") not in VALID_TYPES:
        return None
    conf = obj.get("confidence_score")
    if not isinstance(conf, (int, float)):
        return None
    if obj.get("pii_level") is not None and obj["pii_level"] not in VALID_PII:
        return None
    return obj


@dataclass
class AIClassifier:
    """Drives the provider chain per column. Stateless w.r.t. data —
    operates on the profiler's stats rows, never on raw rows."""

    providers: list[Provider] = field(default_factory=list)
    success_counts: dict[str, int] = field(default_factory=dict)

    @property
    def ai_enabled(self) -> bool:
        return bool(self.providers)

    def classify_column(
        self,
        column_name: str,
        sample_values: list[str],
        total_rows: int,
        null_count: int,
        unique_count: int,
    ) -> dict[str, Any] | None:
        """op24: try providers in order; first parseable answer wins."""
        prompt = build_prompt(
            column_name, sample_values, total_rows, null_count, unique_count
        )
        for p in self.providers:
            try:
                parsed = parse_response(p.complete(prompt))
            except Exception:
                continue
            if parsed is not None:
                self.success_counts[p.name] = self.success_counts.get(p.name, 0) + 1
                parsed.setdefault("confidence_score", 0.7)
                parsed["_provider"] = p.name
                return parsed
        return None

    def most_successful_provider(self) -> str | None:
        """op28 (reconstructed): provider with the most parsed answers."""
        if not self.success_counts:
            return None
        return max(self.success_counts.items(), key=lambda kv: (kv[1], -self_index(kv[0], self.providers)))[0]


def self_index(name: str, providers: list[Provider]) -> int:
    for i, p in enumerate(providers):
        if p.name == name:
            return i
    return len(providers)
