"""Machine-checked report contract (K1), the analog of the reference's
``specs/report.json`` + ``specs/report.py:10-143`` which validate every
emitted cluster report against a draft-07 JSON schema.

The schema below is authored for THIS engine's report shape but preserves
the reference contract's obligations: ``cluster_name`` and
``metadata.timestamp`` required (`specs/report.json` ClusterReport),
``statistics.topics`` required with integer counts, consumer-group totals
requiring ``total``, waste categories requiring
``topics``/``topic_partitions_sum``/``description`` with percentage
bounds 0-100, the governance naming-convention block, and the
schema-registry block with ``schemas_estimates.detected_unused``.
Extra leaves this engine adds (``versions_count``, ``non_compliant_count``)
are declared rather than smuggled through ``additionalProperties``.
"""

from __future__ import annotations

import json

_GOV_NAMING = {
    "type": "object",
    "required": ["total", "total_measured", "compliant_percentage"],
    "properties": {
        "total": {"type": "number", "minimum": 0},
        "total_ignored": {"type": "number", "minimum": 0},
        "total_measured": {"type": "number", "minimum": 0},
        "non_compliant_count": {"type": "number", "minimum": 0},
        "compliant_percentage": {
            "type": "number",
            "minimum": 0,
            "maximum": 100,
        },
    },
}

_WASTE_CATEGORY = {
    "type": "object",
    "required": ["topics", "topic_partitions_sum", "description"],
    "properties": {
        "topics": {
            "type": "object",
            "additionalProperties": False,
            "patternProperties": {
                r"[a-zA-Z0-9_.\-]{1,256}": {"type": "integer", "minimum": 1}
            },
        },
        "topics_count": {"type": "integer", "minimum": 0},
        "topic_partitions_sum": {"type": "integer", "minimum": 0},
        "cluster_percentage": {
            "type": "number",
            "minimum": 0,
            "maximum": 100,
        },
        "description": {"type": "string"},
    },
}

REPORT_SCHEMA = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "title": "Cluster Usage Report Structure",
    "type": "object",
    "required": ["cluster_name", "metadata"],
    "properties": {
        "cluster_name": {"type": "string"},
        "metadata": {
            "type": "object",
            "required": ["timestamp"],
            "properties": {"timestamp": {"type": "string"}},
        },
        "statistics": {
            "type": "object",
            "additionalProperties": False,
            "required": ["topics"],
            "properties": {
                "topics": {"type": "integer"},
                "partitions": {"type": "integer"},
                "most_active_topics": {
                    "oneOf": [
                        {"type": "array", "items": {"type": "string"}},
                        {"type": "object"},
                    ]
                },
                "consumer_groups": {
                    "type": "object",
                    "additionalProperties": False,
                    "required": ["total"],
                    "properties": {
                        "total": {"type": "integer"},
                        "active": {"type": "integer"},
                        "inactive": {"type": "integer"},
                    },
                },
            },
        },
        "estimated_waste": {
            "type": "object",
            "properties": {
                "topics": {"type": "integer"},
                "partitions": {"type": "integer"},
                "topic_categories": {
                    "type": "object",
                    "patternProperties": {"^[a-zA-Z0-9_]+": _WASTE_CATEGORY},
                },
            },
        },
        "governance": {
            "type": "object",
            "properties": {
                "topic_naming_convention": _GOV_NAMING,
                "consumer_group_naming_convention": _GOV_NAMING,
            },
        },
        "schema_registry": {
            "type": "object",
            "additionalProperties": False,
            "properties": {
                "subjects_count": {"type": "integer", "minimum": 0},
                "schemas_count": {"type": "integer", "minimum": 0},
                "versions_count": {"type": "integer", "minimum": 0},
                "unused_subjects_count": {"type": "integer", "minimum": 0},
                "schemas_estimates": {
                    "type": "object",
                    "additionalProperties": False,
                    "properties": {
                        "detected_unused": {
                            "type": "array",
                            "items": {"type": "string"},
                        },
                        "detected_unused_count": {
                            "type": "integer",
                            "minimum": 0,
                        },
                    },
                },
            },
        },
    },
}


def validate_report(report: str | dict) -> None:
    """Raise ``jsonschema.ValidationError`` if the report violates the
    contract; the sink-side gate the reference applies before upload
    (`specs/report.py:130-143`)."""
    import jsonschema

    payload = json.loads(report) if isinstance(report, str) else report
    jsonschema.validate(payload, REPORT_SCHEMA)
