"""Rich daily trading summary (reference: utils/slack_daily_summary.py).

The reference formats Slack Block-Kit from today's fills, the account
value, and the open positions (slack_daily_summary.py:47-202). Here
the block construction is a PURE function over driver-sized collected
rows — no messaging SDK — and the transport stays a pluggable sink:
sinks that understand structured blocks get them verbatim, plain-text
sinks get a faithful text rendering. Block structure reproduced:

- header + four summary fields (portfolio value, day P&L or trade
  count, total volume, open-position count),
- buys/sells totals section,
- top-3 buys and top-3 sells (qty @ price = notional),
- top-5 positions by value.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Protocol

from pyspark.sql import DataFrame


class BlockMessageSink(Protocol):
    def send_blocks(self, text: str, blocks: list[dict]) -> None: ...


@dataclass
class RecordingBlockSink:
    sent: list[tuple[str, list[dict]]] = field(default_factory=list)

    def send_blocks(self, text: str, blocks: list[dict]) -> None:
        self.sent.append((text, blocks))


def _mrkdwn(text: str) -> dict:
    return {"type": "section", "text": {"type": "mrkdwn", "text": text}}


def build_daily_summary_blocks(
    fills: list[dict],
    account_value: float,
    positions: list[dict] | None = None,
    previous_account_value: float | None = None,
) -> tuple[str, list[dict]]:
    """(headline text, Block-Kit blocks) from collected rows.

    Mirrors slack_daily_summary.py:27-44 (categorize) and 93-198
    (block layout), including the empty-day short form (60-76).
    """
    if not fills:
        return (
            "No trades executed today",
            [
                _mrkdwn(
                    "*No trades executed today*\n\n"
                    f"Portfolio value: ${account_value:,.2f}"
                )
            ],
        )
    positions = sorted(positions or [], key=lambda p: p["value"], reverse=True)
    buys = sorted(
        (o for o in fills if o["side"] == "buy"), key=lambda o: o["notional"], reverse=True
    )
    sells = sorted(
        (o for o in fills if o["side"] == "sell"), key=lambda o: o["notional"], reverse=True
    )
    total_buys = sum(o["notional"] for o in buys)
    total_sells = sum(o["notional"] for o in sells)
    total = total_buys + total_sells

    if previous_account_value:
        pnl = account_value - previous_account_value
        pnl_field = f"*Day P&L*\n${pnl:,.2f} ({pnl / previous_account_value * 100:+.2f}%)"
    else:
        pnl_field = f"*Trades Executed*\n{len(fills)}"
    blocks: list[dict] = [
        {"type": "header", "text": {"type": "plain_text", "text": "Daily Trading Summary"}},
        {
            "type": "section",
            "fields": [
                {"type": "mrkdwn", "text": f"*Portfolio Value*\n${account_value:,.2f}"},
                {"type": "mrkdwn", "text": pnl_field},
                {"type": "mrkdwn", "text": f"*Total Volume*\n${total:,.2f}"},
                {"type": "mrkdwn", "text": f"*Positions*\n{len(positions)} open"},
            ],
        },
        {"type": "divider"},
    ]
    trade_lines = []
    if buys:
        trade_lines.append(f"*Buys:* {len(buys)} · ${total_buys:,.2f}")
    if sells:
        trade_lines.append(f"*Sells:* {len(sells)} · ${total_sells:,.2f}")
    if trade_lines:
        blocks.append(_mrkdwn("\n".join(trade_lines)))
        blocks.append({"type": "divider"})
    for title, side_rows in (("*Top 3 Buys*", buys[:3]), ("*Top 3 Sells*", sells[:3])):
        if side_rows:
            lines = [
                f"{i}. {o['filled_qty']:.2f} `{o['ticker']}` @ "
                f"${o['filled_avg_price']:.2f} = ${o['notional']:,.2f}"
                for i, o in enumerate(side_rows, 1)
            ]
            blocks.append(_mrkdwn(title + "\n" + "\n".join(lines)))
    if positions:
        top5 = positions[:5]
        lines = [f"*Top {len(top5)} Positions*"] + [
            f"{i}. `{p['ticker']}`: ${p['value']:,.2f}" for i, p in enumerate(top5, 1)
        ]
        blocks.append({"type": "divider"})
        blocks.append(_mrkdwn("\n".join(lines)))
    return "Daily Trading Summary", blocks


def render_blocks_text(blocks: list[dict]) -> str:
    """Plain-text rendering for sinks without block support."""
    out = []
    for b in blocks:
        if b["type"] == "header":
            out.append(b["text"]["text"])
        elif b["type"] == "divider":
            out.append("---")
        elif b["type"] == "section":
            if "text" in b:
                out.append(b["text"]["text"])
            if "fields" in b:
                out.extend(f["text"] for f in b["fields"])
    return "\n".join(out)


def deliver(sink, text: str, blocks: list[dict] | None = None) -> None:
    """One delivery contract for every summary in the codebase:
    ``send_blocks(text, blocks)`` preferred, ``send(text)`` fallback —
    the same preference order as the rich summary and the failure
    handler, so a dual-interface sink sees ONE transport everywhere.
    ``blocks`` defaults to the text as a single well-formed mrkdwn
    section (a bare-string section is rejected by Slack with
    invalid_blocks)."""
    if hasattr(sink, "send_blocks"):
        sink.send_blocks(text, blocks if blocks is not None else [_mrkdwn(text)])
    else:
        sink.send(text)


def send_daily_trading_summary(
    fills: DataFrame,
    account_value: float,
    sink,
    positions: DataFrame | None = None,
    previous_account_value: float | None = None,
) -> tuple[str, list[dict]]:
    """Collect the (driver-sized) fills/positions frames, build the
    blocks, and deliver through whichever interface the sink has —
    ``send_blocks(text, blocks)`` preferred, ``send(text)`` fallback."""
    fill_rows = [r.asDict() for r in fills.collect()]
    pos_rows = (
        [{"ticker": r["ticker"], "value": float(r["notional"])} for r in positions.collect()]
        if positions is not None
        else []
    )
    text, blocks = build_daily_summary_blocks(
        fill_rows, account_value, pos_rows, previous_account_value
    )
    if hasattr(sink, "send_blocks"):
        sink.send_blocks(text, blocks)
    else:
        sink.send(render_blocks_text(blocks))
    return text, blocks


def build_flow_failure_blocks(
    flow_name: str,
    error: BaseException,
    context: dict | None = None,
    max_traceback_chars: int = 2000,
) -> tuple[str, list[dict]]:
    """(headline text, Block-Kit blocks) for a failed flow.

    Mirrors the reference's failure handler layout
    (utils/slack_failure_handler.py:31-97): header "Flow Failed:
    <name>", error type + message section, optional context section
    (run_id, parameters truncated at 200 chars), divider, then the
    formatted traceback in a code block — tail-truncated to fit
    messaging limits (the END of a traceback carries the signal)."""
    import traceback as _tb

    tb_str = "".join(_tb.format_exception(type(error), error, error.__traceback__))
    if len(tb_str) > max_traceback_chars:
        # the marker LEADS: the HEAD of the traceback was removed, and
        # a trailing "(truncated)" would read as the raising frame
        # having been cut off — sending the on-call reader log-hunting
        # for exactly the tail they are looking at
        tb_str = "(truncated) ...\n" + tb_str[-(max_traceback_chars - 50) :]

    context_lines = []
    if context:
        if "run_id" in context:
            context_lines.append(f"*Run ID:* `{context['run_id']}`")
        if "parameters" in context:
            params_str = str(context["parameters"])
            if len(params_str) > 200:
                params_str = params_str[:197] + "..."
            context_lines.append(f"*Parameters:* `{params_str}`")

    headline = f"Flow Failed: {flow_name}"
    blocks: list[dict] = [
        {"type": "header", "text": {"type": "plain_text", "text": headline}},
        _mrkdwn(
            f"*Error Type:* `{type(error).__name__}`\n*Error Message:* {error}"
        ),
    ]
    if context_lines:
        blocks.append(_mrkdwn("\n".join(context_lines)))
    blocks.extend(
        [
            {"type": "divider"},
            _mrkdwn("*Traceback:*\n```" + tb_str + "```"),
        ]
    )
    return headline, blocks


def send_flow_failure_notification(
    flow_name: str,
    error: BaseException,
    sink,
    context: dict | None = None,
) -> tuple[str, list[dict]]:
    """Build and deliver the failure blocks — ``send_blocks`` preferred,
    plain ``send`` fallback (same delivery contract as the daily
    summary)."""
    text, blocks = build_flow_failure_blocks(flow_name, error, context)
    if hasattr(sink, "send_blocks"):
        sink.send_blocks(text, blocks)
    else:
        sink.send(render_blocks_text(blocks))
    return text, blocks


def create_failure_handler(flow_name: str, sink, context: dict | None = None):
    """on_failure hook factory (reference slack_failure_handler.py:106-148).

    Returns a one-argument callable for the runner's ``on_failure``
    slot: it receives the exception the flow raised and posts the
    formatted notification. A broken handler never masks the original
    flow failure — delivery errors are swallowed (matching the
    reference's hook, which logs and continues)."""

    def on_failure_hook(error: BaseException) -> None:
        try:
            send_flow_failure_notification(flow_name, error, sink, context)
        except Exception as e:  # pragma: no cover - defensive
            print(f"failure handler for {flow_name!r} could not deliver: {e}")

    return on_failure_hook
