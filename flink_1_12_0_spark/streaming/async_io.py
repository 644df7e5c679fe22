"""Async I/O: ordered/unordered async enrichment inside the data plane.

Reference: AsyncDataStream.java:43 / AsyncWaitOperator.java:78 — Flink
keeps a queue of in-flight futures per operator, with ordered or
unordered result emission and a capacity cap for backpressure.

Spark-first: the operator boundary is already an Arrow batch, so the
natural equivalent runs an asyncio event loop *inside* ``mapInPandas``:
all rows of a batch issue their requests concurrently (bounded by
``capacity``), results re-attach by position — i.e. "ordered" semantics
come for free, and concurrency amortizes external-call latency exactly
like Flink's in-flight queue.  Unordered emission does not change results
in a batch engine (the batch is the emission unit), so only the ordered
path exists.

At scale: concurrency is per-task, so total in-flight = capacity x tasks;
size ``capacity`` against the external system's rate limit.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame


def async_enrich(
    df: DataFrame,
    key: str,
    fetch_async: Callable,
    out_fields: Sequence[tuple[str, str]],
    capacity: int = 100,
    timeout_s: float | None = None,
    retries: int = 0,
    on_timeout: str = "empty",
) -> DataFrame:
    """Enrich each row by awaiting ``fetch_async(key) -> dict`` with at
    most ``capacity`` requests in flight per task — AsyncDataStream's
    orderedWait (results stay row-aligned, like the reference's ordered
    emitter).

    ``timeout_s``/``retries``: per-request timeout with ``retries``
    re-attempts — AsyncWaitOperator's timeout handling
    (AsyncWaitOperator.java:78 registers a timer per request; the default
    AsyncFunction.timeout() throws, overriding it emits a fallback).
    ``on_timeout='empty'`` emits NULL enrichment fields after the last
    retry, ``'raise'`` propagates (the reference's default failure mode).

    ``out_fields``: (name, spark_type_ddl) appended as ``r_<name>``.
    """
    if on_timeout not in ("empty", "raise"):
        raise ValueError("on_timeout must be 'empty' or 'raise'")
    schema = ", ".join(
        [f"`{n}` {t}" for n, t in df.dtypes] + [f"`r_{n}` {t}" for n, t in out_fields]
    )
    names = [n for n, _ in out_fields]

    def run(batches: Iterator) -> Iterator:
        import asyncio

        async def gather(keys):
            sem = asyncio.Semaphore(capacity)

            async def one(k):
                async with sem:
                    for attempt in range(retries + 1):
                        try:
                            coro = fetch_async(k)
                            if timeout_s is not None:
                                return await asyncio.wait_for(coro, timeout_s)
                            return await coro
                        except asyncio.TimeoutError:
                            if attempt == retries:
                                if on_timeout == "raise":
                                    raise
                                return {}
                    return {}

            return await asyncio.gather(*[one(k) for k in keys])

        for pdf in batches:
            results = asyncio.run(gather(pdf[key].tolist()))
            for n in names:
                pdf[f"r_{n}"] = [r.get(n) for r in results]
            yield pdf

    return df.mapInPandas(run, schema)
