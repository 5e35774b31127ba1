"""Usage-report notifications (K5) with template rendering (F7).

The reference renders Jinja2 templates (``default``/``email``) with the
cluster id and the report's S3 locations, then publishes both renderings
as a json-structure SNS message (`notifications/aws_sns/__init__.py:
82-152`). Replicated as data-plane operations: a dependency-free renderer
covering the template features those templates use (variable substitution
and ``{% if %}`` blocks), and a publish-request builder that returns the
SNS API call as data — the same protocol/transport split as the
pushgateway sink. The live boto3 publisher is a seam.
"""

from __future__ import annotations

import json
import re
from typing import Callable

# Our default templates — same variables and message intent as the
# reference's usage_report templates (default.j2 / email.j2), our wording.
DEFAULT_TEMPLATE = (
    '{"kafka_cluster": "{{KAFKA_CLUSTER_ID}}",'
    '"usage_s3_url":"{{USAGE_REPORT_S3_URL}}"}'
)

EMAIL_TEMPLATE = """Kafka usage report - {{ KAFKA_CLUSTER_ID }}

The usage report for Kafka cluster {{ KAFKA_CLUSTER_ID }} is available.
S3 URL: {{ USAGE_REPORT_S3_URL }}
{% if USAGE_REPORT_S3_SIGNED_URL %}Signed link: {{ USAGE_REPORT_S3_SIGNED_URL }}{% endif %}
Review the report to reduce topic and partition waste."""

_VAR = re.compile(r"\{\{\s*([A-Za-z_][A-Za-z0-9_]*)\s*\}\}")
_IF_BLOCK = re.compile(
    r"\{%\s*if\s+([A-Za-z_][A-Za-z0-9_]*)\s*%\}(.*?)\{%\s*endif\s*%\}",
    re.DOTALL,
)


def render_template(template: str, variables: dict[str, str | None]) -> str:
    """Minimal deterministic renderer for the feature set the usage-report
    templates use: ``{{ VAR }}`` substitution and truthiness-gated
    ``{% if VAR %}...{% endif %}`` blocks. Unknown variables render
    empty, like Jinja2's default undefined."""

    def _if(m: re.Match) -> str:
        return m.group(2) if variables.get(m.group(1)) else ""

    def _var(m: re.Match) -> str:
        v = variables.get(m.group(1))
        return "" if v is None else str(v)

    return _VAR.sub(_var, _IF_BLOCK.sub(_if, template))


def render_usage_report_message(
    template: str,
    cluster_id: str,
    s3_url: str | None = None,
    s3_uri: str | None = None,
    s3_signed_url: str | None = None,
) -> str:
    """The reference's render signature (`aws_sns/__init__.py:107-127`)."""
    return render_template(
        template,
        {
            "KAFKA_CLUSTER_ID": cluster_id,
            "USAGE_REPORT_S3_URL": s3_url,
            "USAGE_REPORT_S3_URI": s3_uri,
            "USAGE_REPORT_S3_SIGNED_URL": s3_signed_url,
        },
    )


def build_publish_request(
    topic_arn: str, subject: str, message: str | dict
) -> dict:
    """SNS ``publish`` call as data. A dict message becomes a
    json-structure publish, exactly the reference's branch
    (`aws_sns/__init__.py:84-99`)."""
    if not isinstance(message, (str, dict)):
        raise TypeError(f"message must be str or dict, not {type(message)}")
    req = {"TopicArn": topic_arn, "Subject": subject}
    if isinstance(message, str):
        req["Message"] = message
    else:
        req["Message"] = json.dumps(message)
        req["MessageStructure"] = "json"
    return req


class SnsChannel:
    """Notification channel: named templates → rendered message set →
    publish request, with a pluggable publisher (the boto3 client call in
    production; a capture function in tests). ``ignore_errors`` mirrors
    the reference's per-channel render-failure policy."""

    def __init__(
        self,
        name: str,
        topic_arn: str,
        templates: dict[str, str] | None = None,
        ignore_errors: bool = False,
        publisher: Callable[[dict], None] | None = None,
    ) -> None:
        self.name = name
        self.topic_arn = topic_arn
        self.templates = templates or {
            "default": DEFAULT_TEMPLATE,
            "email": EMAIL_TEMPLATE,
        }
        self.ignore_errors = ignore_errors
        self.publisher = publisher

    def send_usage_report_notification(
        self,
        cluster_id: str,
        subject: str,
        s3_uri: str | None = None,
        s3_url: str | None = None,
        s3_signed_url: str | None = None,
    ) -> dict:
        """Render every template; publish the message set as a
        json-structure message (`aws_sns/__init__.py:129-152`). Returns
        the publish request (data) after handing it to the publisher."""
        messages: dict[str, str] = {}
        for message_type, template in self.templates.items():
            try:
                messages[message_type] = render_usage_report_message(
                    template, cluster_id, s3_url, s3_uri, s3_signed_url
                )
            except Exception:
                if not self.ignore_errors:
                    raise
        req = build_publish_request(self.topic_arn, subject, messages)
        if self.publisher is not None:
            self.publisher(req)
        return req


def boto3_publisher() -> Callable[[dict], None]:
    """Live SNS publisher seam (boto3 absent in this container)."""
    try:
        import boto3  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "SNS publishing requires boto3; pass a custom publisher"
        ) from exc
    client = boto3.client("sns")  # pragma: no cover
    return lambda req: client.publish(**req)  # pragma: no cover
