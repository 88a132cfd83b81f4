"""Driver-side HTML rendering of the metrics dict
(reference `pipeline/report-lambda/generate_report.py:160-387`, S10).

Pure Python over the collected aggregates — no DataFrame work here by
design; delivery (S3 put / email) stays outside the engine.
"""

from __future__ import annotations

from html import escape
from typing import Any

_STYLE = (
    "font-family:sans-serif;border-collapse:collapse;"
)


def render_html(metrics: dict[str, Any], title: str = "Daily Report") -> str:
    if metrics.get("empty"):
        return f"<html><body><h1>{escape(title)}</h1><p>No transactions for this period.</p></body></html>"

    rows = "".join(
        f"<tr><td>{escape(str(g['name']))}</td><td>{g['transactions']}</td><td>{g['revenue']:.2f}</td></tr>"
        for g in metrics["by_group"]
    )
    methods = "".join(
        f"<tr><td>{escape(str(m))}</td><td>{v['transactions']}</td><td>{v['revenue']:.2f}</td>"
        f"<td>{v['pct_of_revenue']:.2f}%</td><td>{v['fee']:.2f}</td></tr>"
        for m, v in metrics["by_method"].items()
    )
    return f"""<html><body style="{_STYLE}">
<h1>{escape(title)}</h1>
<p>Transactions: <b>{metrics['total_transactions']}</b> ·
Revenue: <b>{metrics['total_revenue']:.2f}</b> ·
Avg: <b>{metrics['avg_transaction']:.2f}</b> ·
Card fees: <b>{metrics['card_fees']:.2f}</b> ·
Net: <b>{metrics['net_revenue']:.2f}</b></p>
<p>Best: <b>{escape(str(metrics['best_group']))}</b> ·
Worst: <b>{escape(str(metrics['worst_group']))}</b></p>
<h2>By group</h2><table border="1">{rows}</table>
<h2>By payment method</h2><table border="1">{methods}</table>
</body></html>"""
