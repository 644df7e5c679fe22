"""CEP / MATCH_RECOGNIZE subset: pattern matching over keyed event sequences.

Reference: flink-libraries/flink-cep (NFA engine, cep/operator/CepOperator.java:83)
and SQL MATCH_RECOGNIZE (StreamExecMatch.scala:68, MatchCodeGenerator.scala).
Covered subset — contiguous patterns (strict continuity), greedy
quantifiers {min,max} / + / * / ?, WITHIN, AFTER MATCH SKIP PAST LAST ROW /
TO NEXT ROW, and MEASURES with FIRST/LAST/COUNT navigation — the core the
reference's MatchRecognizeITCase exercises.

Spark has NO pattern-matching primitive.  Design:
- batch: ``applyInPandas`` per partition key — sort by event time, run a
  backtracking NFA over the row sequence, emit one row per match.  The
  sequence scan is linear with small backtracking windows (quantifiers are
  bounded by WITHIN); per-key sequences shard across executors, so 100 TB
  scales by key cardinality like every keyed operator here.
- streaming: same matcher over a per-key state buffer
  (``applyInPandasWithState``).  AFTER MATCH SKIP PAST LAST ROW only
  (overlapping modes would re-emit across batches); WITHIN bounds the
  buffer exactly like the reference's NFA state cleanup — unmatched
  prefixes older than the horizon are pruned.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout


@dataclass
class Step:
    """One pattern variable: ``name`` with row-predicate ``where`` and a
    greedy quantifier [min_times, max_times] (max_times=None → unbounded)."""

    name: str
    where: Callable  # (row: pandas.Series) -> bool
    min_times: int = 1
    max_times: int | None = 1


def _match_at(rows, start: int, steps: Sequence[Step], within_s: float | None, ts_col: str):
    """Greedy backtracking match of ``steps`` anchored at ``start`` over the
    contiguous row window.  Returns {step_name: [row_idx, ...]} or None."""
    n = len(rows)

    def horizon_ok(end_idx: int) -> bool:
        if within_s is None:
            return True
        return (rows[end_idx][ts_col] - rows[start][ts_col]).total_seconds() <= within_s

    def rec(si: int, pos: int, spans):
        if si == len(steps):
            return spans
        step = steps[si]
        # count how many contiguous rows satisfy this step's predicate
        cnt = 0
        while (
            pos + cnt < n
            and (step.max_times is None or cnt < step.max_times)
            and step.where(rows[pos + cnt])
            and horizon_ok(pos + cnt)
        ):
            cnt += 1
        # greedy: longest first, backtrack down to min_times
        for take in range(cnt, step.min_times - 1, -1):
            res = rec(
                si + 1,
                pos + take,
                {**spans, step.name: list(range(pos, pos + take))},
            )
            if res is not None:
                return res
        return None

    spans = rec(0, start, {})
    if spans is None:
        return None
    used = [i for v in spans.values() for i in v]
    if not used:
        return None
    return spans


class Match:
    """Measure navigation over one match (FIRST/LAST/COUNT of a variable).

    Operates on plain dict records — pandas ``.iloc`` row access in the
    scan loop costs a Series construction per touch, which dominated the
    NFA's runtime before the switch."""

    def __init__(self, records, spans):
        self._records = records
        self.spans = spans

    def first(self, step: str, col: str):
        idx = self.spans.get(step) or []
        return self._records[idx[0]][col] if idx else None

    def last(self, step: str, col: str):
        idx = self.spans.get(step) or []
        return self._records[idx[-1]][col] if idx else None

    def count(self, step: str) -> int:
        return len(self.spans.get(step) or [])


def _scan(pdf, steps, within_s, ts_col, after_match, measures, key_dict):
    out = []
    rows = pdf.to_dict("records")
    i = 0
    while i < len(rows):
        spans = _match_at(rows, i, steps, within_s, ts_col)
        if spans:
            m = Match(rows, spans)
            out.append({**key_dict, **{name: fn(m) for name, fn in measures}})
            end = max(ix for v in spans.values() for ix in v) + 1
            i = end if after_match == "past_last_row" else i + 1
        else:
            i += 1
    return out


def match_recognize(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    steps: Sequence[Step],
    measures: Sequence[tuple[str, Callable]],
    out_schema: str,
    within: float | None = None,
    after_match: str = "past_last_row",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch MATCH_RECOGNIZE: one output row per match.

    ``measures``: (output_col, fn(Match) -> value); ``out_schema`` is the
    DDL for partition keys + measures; ``within`` in seconds.
    """
    partition_by = list(partition_by)
    order_by = list(order_by)

    cols = partition_by + [name for name, _ in measures]

    def run(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_by, kind="mergesort").reset_index(drop=True)
        key_dict = dict(zip(partition_by, key))
        return pd.DataFrame(
            _scan(pdf, steps, within, ts_col, after_match, measures, key_dict),
            columns=cols,
        )

    return df.groupBy(*partition_by).applyInPandas(run, out_schema)


def match_recognize_stream(
    sdf: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    steps: Sequence[Step],
    measures: Sequence[tuple[str, Callable]],
    out_schema: str,
    within: float,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming MATCH_RECOGNIZE (AFTER MATCH SKIP PAST LAST ROW only).

    Per-key state buffers unmatched rows; matched prefixes are consumed,
    rows older than ``within`` below the key's max event time are pruned —
    the same cleanup contract as the reference NFA's WITHIN handling.
    """
    import json

    partition_by = list(partition_by)
    order_by = list(order_by)
    state_schema = "buf string"
    data_cols = [c for c in sdf.columns if c not in partition_by]
    col_types = dict(sdf.dtypes)

    def fn(key, pdfs, state):
        import pandas as pd

        buf = json.loads(state.get[0]) if state.exists else []
        frames = []
        if buf:
            restored = pd.DataFrame(buf)
            for c in restored.columns:
                if col_types.get(c) in ("timestamp", "timestamp_ntz"):
                    restored[c] = pd.to_datetime(restored[c])
            frames.append(restored)
        for p in pdfs:
            if not p.empty:
                frames.append(p[data_cols])
        if not frames:
            return
        pdf = (
            pd.concat(frames, ignore_index=True)
            .sort_values(order_by, kind="mergesort")
            .reset_index(drop=True)
        )
        key_dict = dict(zip(partition_by, key))
        rows = pdf.to_dict("records")
        out, i = [], 0
        consumed_until = 0
        while i < len(rows):
            spans = _match_at(rows, i, steps, within, ts_col)
            if spans:
                m = Match(rows, spans)
                out.append({**key_dict, **{nm: f(m) for nm, f in measures}})
                i = max(ix for v in spans.values() for ix in v) + 1
                consumed_until = i
            else:
                i += 1
        # retain unconsumed suffix within the time horizon
        horizon = rows[-1][ts_col].timestamp() - within
        keep = pdf.iloc[consumed_until:]
        if not keep.empty:
            keep = keep[keep[ts_col].map(lambda x: x.timestamp()) >= horizon]
        rec = []
        for _, r in keep.iterrows():
            rec.append(
                {
                    c: (r[c].isoformat() if hasattr(r[c], "isoformat") else r[c])
                    for c in data_cols
                }
            )
        state.update((json.dumps(rec),))
        if out:
            yield pd.DataFrame(out)

    return sdf.groupBy(*partition_by).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
