"""B16 PutSlack → webhook notifier via foreachBatch.

Reference (56409-tika.xml:1010-1110): POST a message per FlowFile to a
Slack webhook, used as the `bad`/`failure` route destination. Spark
shape: collect the (small, already-routed) batch per trigger and POST —
payload building is pure and testable; transport is injectable so tests
use a recording fake instead of the network.
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Callable

from pyspark.sql import DataFrame


def _default_post(url: str, payload: dict) -> int:
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=10) as resp:  # noqa: S310
        return resp.status


def build_payload(row: dict, template: str = "{filename}: {error}") -> dict:
    """Slack-style {"text": ...} message from a routed row."""
    try:
        text = template.format(**row)
    except (KeyError, IndexError):
        text = json.dumps(row, default=str)
    return {"text": text}


def notify_webhook(
    df: DataFrame,
    url: str,
    template: str = "{filename}: {error}",
    post: Callable[[str, dict], int] = _default_post,
    max_rows: int = 1000,
) -> int:
    """POST one message per row (bounded); returns messages sent.

    Routed error/alert streams are small by construction; the bound
    guards against accidentally pointing this at a fact table.
    """
    rows = df.limit(max_rows).collect()
    sent = 0
    for r in rows:
        post(url, build_payload(r.asDict(), template))
        sent += 1
    return sent


def webhook_foreach_batch(
    url: str,
    template: str = "{filename}: {error}",
    post: Callable[[str, dict], int] = _default_post,
):
    """foreachBatch hook for streaming pipelines:
    `stream.writeStream.foreachBatch(webhook_foreach_batch(url))`."""
    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        notify_webhook(batch_df, url, template, post)
    return _fn
