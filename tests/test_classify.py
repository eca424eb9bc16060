"""Classifier-layer tests: fixture ports of the reference's test intent
(FIXTURES.md F1/F2/F4/F5/F6) against the Spark profiler + hybrid merge."""

from __future__ import annotations

import pytest

from ai_data_pipeline_spark.classify.ai import AIClassifier, build_prompt, parse_response
from ai_data_pipeline_spark.classify.hybrid import HybridClassifier, merge_pii, merge_profiles
from ai_data_pipeline_spark.classify.providers import MockProvider
from ai_data_pipeline_spark.profiling.patterns import snake_case
from ai_data_pipeline_spark.profiling.profiler import profile_table


@pytest.fixture(scope="module")
def customer_profile(spark):
    """F1 sample_customer_data port (conftest.py:12-27 shape)."""
    rows = [
        (1001, "john@example.com", "+1-555-0123", "John", "Doe", 25, True,
         "2023-01-15", "active", 5, 150.50),
        (1002, "jane@test.org", "555-987-6543", "Jane", "Smith", 34, False,
         "2023-02-20", "inactive", 2, 89.99),
        (1003, "bob@company.net", "(555) 123-4567", "Bob", "Jones", 45, True,
         "2023-03-10", "active", 8, 1200.00),
        (1004, "alice@email.co", "555.111.2222", "Alice", "Brown", 29, False,
         "2023-04-05", "pending", 1, 45.25),
        (1005, "charlie@web.io", "+1 555 333 4444", "Charlie", "Wilson", 52, True,
         "2023-05-12", "active", 12, 678.90),
    ]
    schema = (
        "customer_id long, email string, phone string, first_name string, "
        "last_name string, age long, is_premium boolean, signup_date string, "
        "status string, total_orders long, account_balance double"
    )
    df = spark.createDataFrame(rows, schema)
    return {r["column_name"]: r.asDict() for r in profile_table(df).collect()}


class TestPatternIntent:
    """Fixed-mode expectations (SURVEY.md §7.6 = the reference tests'
    intent, not its buggy observed behavior)."""

    def test_customer_id_is_identifier_pk(self, customer_profile):
        p = customer_profile["customer_id"]
        assert p["data_type"] == "identifier"  # intent test_classifiers.py:44-50
        assert p["is_primary_key"] is True

    def test_email(self, customer_profile):
        p = customer_profile["email"]
        assert p["data_type"] == "email"
        assert p["pii_level"] == "high"

    def test_phone(self, customer_profile):
        p = customer_profile["phone"]
        assert p["data_type"] == "phone"
        assert p["pii_level"] == "high"

    def test_signup_date_is_date_not_phone(self, customer_profile):
        # the reference's precedence bug made this 'phone' (SURVEY §2.4);
        # fixed mode classifies it as date per test intent (:60-65)
        assert customer_profile["signup_date"]["data_type"] == "date"
        assert customer_profile["signup_date"]["pii_level"] == "none"

    def test_boolean(self, customer_profile):
        assert customer_profile["is_premium"]["data_type"] == "boolean"

    def test_numeric(self, customer_profile):
        assert customer_profile["age"]["data_type"] == "numeric"
        assert customer_profile["account_balance"]["data_type"] == "numeric"

    def test_status_is_business_key_flag(self, customer_profile):
        assert customer_profile["status"]["is_business_key"] is True

    def test_names_pii(self, customer_profile):
        assert customer_profile["first_name"]["pii_level"] == "medium"
        assert customer_profile["last_name"]["pii_level"] == "medium"


class TestMessyData:
    """F2 sample_messy_data port: dirty inputs stay text, no crash."""

    @pytest.fixture(scope="class")
    def messy_profile(self, spark):
        rows = [
            ("ABC123", "USER@DOMAIN.COM", "555-1234", "2023-12-01", "100",
             "true", "This is a description", "A1",
             "550e8400-e29b-41d4-a716-446655440000"),
            ("DEF456", "user@domain.com", "not-a-phone", "12/25/2023", "",
             "FALSE", "Another description here", "B2",
             "6ba7b810-9dad-11d1-80b4-00c04fd430c8"),
            ("GHI789", "", "555.123.4567", "Jan 15, 2024", "250.50",
             "1", "More text content", "C3",
             "6ba7b811-9dad-11d1-80b4-00c04fd430c8"),
            ("JKL012", "invalid.email", "(555) 987-6543", "2024-01-30", "75",
             "0", "Text with special chars: @#$", "A1",
             "6ba7b812-9dad-11d1-80b4-00c04fd430c8"),
            ("MNO345", "test@site.org", "", "2023-11-15", None,
             "yes", "Final description", "B2",
             "6ba7b814-9dad-11d1-80b4-00c04fd430c8"),
        ]
        schema = (
            "ID_FIELD string, mixed_case_Email string, Phone_Numbers string, "
            "dates_various_formats string, numeric_with_nulls string, "
            "boolean_mixed string, free_text string, category_codes string, "
            "uuid_field string"
        )
        df = spark.createDataFrame(rows, schema)
        return {r["column_name"]: r.asDict() for r in profile_table(df).collect()}

    def test_id_field(self, messy_profile):
        assert messy_profile["ID_FIELD"]["data_type"] == "identifier"
        assert messy_profile["ID_FIELD"]["is_primary_key"] is True

    def test_uuid_field(self, messy_profile):
        assert messy_profile["uuid_field"]["data_type"] == "identifier"
        assert messy_profile["uuid_field"]["is_primary_key"] is True

    def test_mixed_email_below_threshold(self, messy_profile):
        assert messy_profile["mixed_case_Email"]["data_type"] == "text"

    def test_mixed_dates_below_threshold(self, messy_profile):
        assert messy_profile["dates_various_formats"]["data_type"] == "text"

    def test_boolean_mixed_no_single_pattern(self, messy_profile):
        assert messy_profile["boolean_mixed"]["data_type"] == "text"

    def test_null_ratio(self, messy_profile):
        assert messy_profile["numeric_with_nulls"]["null_ratio"] == 0.2


class TestNameNormalization:
    """F5 cases (test_classifiers.py:111-122)."""

    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("Customer ID", "customer_id"),
            ("first-name", "first_name"),
            ("EmailAddress", "email_address"),
            ("phone_number", "phone_number"),
        ],
    )
    def test_snake_case(self, raw, expected):
        assert snake_case(raw) == expected


class TestResponseParsing:
    """F6 cases (test_classifiers.py:187-213)."""

    def test_bare_json(self):
        assert parse_response('{"data_type": "email", "confidence_score": 0.9}')[
            "data_type"
        ] == "email"

    def test_json_fenced(self):
        r = parse_response('```json\n{"data_type": "text", "confidence_score": 0.8}\n```')
        assert r["confidence_score"] == 0.8

    def test_bare_fenced(self):
        r = parse_response('```\n{"data_type": "date", "confidence_score": 0.7}\n```')
        assert r["data_type"] == "date"

    def test_invalid_text(self):
        assert parse_response("not json at all") is None

    def test_unterminated(self):
        assert parse_response('{"data_type": "email", ') is None

    def test_wrong_types(self):
        assert parse_response('{"data_type": "email", "confidence_score": "high"}') is None

    def test_unknown_type(self):
        assert parse_response('{"data_type": "blob", "confidence_score": 0.9}') is None


class TestAIClassifier:
    def test_no_providers_disabled(self):
        ai = AIClassifier([])
        assert ai.ai_enabled is False
        assert ai.classify_column("c", [], 5, 0, 5) is None

    def test_mock_roundtrip(self):
        ai = AIClassifier([MockProvider()])
        res = ai.classify_column("email_address", ["a@b.com"], 5, 0, 5)
        assert res is not None
        assert res["_provider"] == "mock"
        assert ai.success_counts["mock"] == 1

    def test_fallback_chain(self):
        ai = AIClassifier([MockProvider(name="dead", fail=True), MockProvider(name="live")])
        res = ai.classify_column("x", [], 5, 0, 5)
        assert res["_provider"] == "live"

    def test_prompt_contains_contract(self):
        p = build_prompt("col", ["v1", "v2"], 10, 1, 9)
        assert "Column name: col" in p
        assert "identifier|business_key|date" in p


class TestHybridMerge:
    PATTERN = {
        "column_name": "status",
        "data_type": "text",
        "confidence": 0.8,
        "is_primary_key": False,
        "is_business_key": True,
        "pii_level": "none",
        "business_meaning": "pattern meaning",
    }

    def test_pattern_only(self):
        m = merge_profiles(self.PATTERN, None)
        assert m["merge_decision"] == "pattern_only"
        assert m["data_type"] == "text"

    def test_consensus_boost(self):
        ai = {"data_type": "text", "confidence_score": 0.9,
              "business_meaning": "ai meaning", "pii_level": "low"}
        m = merge_profiles(self.PATTERN, ai)
        assert m["merge_decision"] == "consensus"
        assert m["confidence"] == min(0.95, (0.8 + 0.9) / 2 + 0.1)
        assert m["business_meaning"] == "ai meaning"
        assert m["pii_level"] == "low"  # ordinal max(none, low)

    def test_ai_override(self):
        ai = {"data_type": "business_key", "confidence_score": 0.85}
        m = merge_profiles(self.PATTERN, ai)
        assert m["merge_decision"] == "ai_override"
        assert m["data_type"] == "business_key"
        assert "AI override" in m["data_quality_notes"]

    def test_low_conf_ai_ignored(self):
        ai = {"data_type": "numeric", "confidence_score": 0.5}
        m = merge_profiles(self.PATTERN, ai)
        assert m["merge_decision"] == "pattern_preferred"
        assert m["data_type"] == "text"

    def test_pii_ordinal_fix(self):
        # the reference's lexicographic bug would pick 'none' over 'high'
        assert merge_pii("none", "high") == "high"
        assert merge_pii("medium", "low") == "medium"
        assert merge_pii("low", None) == "low"

    def test_set_ai_enabled_refuses_without_providers(self):
        h = HybridClassifier(ai=None)
        assert h.set_ai_enabled(True) is False
        assert h.set_ai_enabled(False) is True

    def test_hybrid_classify_with_mock(self, spark):
        df = spark.createDataFrame(
            [(1, "a@b.com"), (2, "c@d.net"), (3, "e@f.org")],
            "row_id long, email string",
        )
        h = HybridClassifier(ai=AIClassifier([MockProvider()]))
        out = h.classify(profile_table(df))
        assert len(out) == 2
        decisions = {o["column_name"]: o["merge_decision"] for o in out}
        assert set(decisions.values()) <= {
            "consensus", "ai_override", "pattern_preferred", "pattern_only",
        }
        st = h.hybrid_stats()
        assert sum(v for k, v in st.items() if not k.endswith("_pct")) == 2
