"""LLM provider interface for AI-assisted column classification.

Parity with the reference's multi-provider design (ai_classifier.py:26-55):
fixed fallback priority claude → gemini → openai, one call per *column*
(not per row — the LLM boundary stays driver-side, SURVEY.md §3), keys
read from the environment. Real SDK calls are import-gated so the engine
runs fully offline; `MockProvider` is the deterministic CI/test path.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass
from typing import Protocol

PROVIDER_PRIORITY = ["claude", "gemini", "openai"]  # ai_classifier.py:55
ENV_KEYS = {
    "claude": "ANTHROPIC_API_KEY",
    "gemini": "GOOGLE_API_KEY",
    "openai": "OPENAI_API_KEY",
}


class Provider(Protocol):
    name: str

    def complete(self, prompt: str) -> str: ...


@dataclass
class MockProvider:
    """Deterministic stand-in: answers the classification prompt from a
    hash of the column name, in the strict-JSON shape the prompt demands
    (op23/op26 contract). Used by CI and the hybrid tests."""

    name: str = "mock"
    fail: bool = False

    def complete(self, prompt: str) -> str:
        if self.fail:
            raise RuntimeError("mock provider forced failure")
        # the prompt embeds `Column name: <name>` — recover it
        col = ""
        for line in prompt.splitlines():
            if line.startswith("Column name:"):
                col = line.split(":", 1)[1].strip()
                break
        h = int(hashlib.md5(col.encode()).hexdigest(), 16)
        types = [
            "identifier", "business_key", "date", "numeric", "text",
            "boolean", "email", "phone", "address",
        ]
        resp = {
            "data_type": types[h % len(types)],
            "confidence_score": 0.7 + (h % 3) / 10.0,
            "is_primary_key": bool(h % 7 == 0),
            "pii_level": ["none", "low", "medium", "high"][h % 4],
            "business_meaning": f"Mock meaning for {col}",
            "suggested_name": col.lower(),
        }
        return "```json\n" + json.dumps(resp) + "\n```"


class _SDKProvider:
    """Lazy real-SDK provider; constructing it without the SDK installed
    or without a key raises, and the chain moves on (op24 semantics)."""

    def __init__(self, name: str):
        self.name = name
        key = os.environ.get(ENV_KEYS[name], "")
        if not key:
            raise RuntimeError(f"no API key for {name}")
        if name == "claude":
            import anthropic  # noqa: F401  (import-gated; offline CI skips)

            self._client = anthropic.Anthropic(api_key=key)
        elif name == "gemini":
            import google.generativeai as genai  # noqa: F401

            genai.configure(api_key=key)
            self._client = genai
        else:
            import openai  # noqa: F401

            self._client = openai.OpenAI(api_key=key)

    def complete(self, prompt: str) -> str:
        if self.name == "claude":
            msg = self._client.messages.create(
                model="claude-3-sonnet-20240229",
                max_tokens=1000,
                messages=[{"role": "user", "content": prompt}],
            )
            return msg.content[0].text
        if self.name == "gemini":
            model = self._client.GenerativeModel("gemini-pro")
            return model.generate_content(prompt).text
        resp = self._client.chat.completions.create(
            model="gpt-4",
            temperature=0.1,
            max_tokens=1000,
            messages=[{"role": "user", "content": prompt}],
        )
        return resp.choices[0].message.content


def providers_from_env() -> list[Provider]:
    """op29 bootstrap: any configured key enables its provider, in fixed
    priority order; none configured → empty list (pattern-only mode)."""
    out: list[Provider] = []
    for name in PROVIDER_PRIORITY:
        if os.environ.get(ENV_KEYS[name]):
            try:
                out.append(_SDKProvider(name))
            except Exception:
                continue
    return out
