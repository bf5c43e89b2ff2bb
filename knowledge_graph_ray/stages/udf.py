"""Retrying, quarantining UDF stage — the operator shape of every
external-service call in the reference (SURVEY.md S2, G4, §2.9 LLM
stages: @retry decorators, rate-limit sleeps, bad_files quarantine).

``RetryingUDFActor`` wraps a per-record function with bounded retries
+ exponential backoff; records that still fail land in an ``error``
column instead of failing the block (one poison record can never kill
a task — get_files.py:87-99 pattern). The default UDF is a
deterministic stand-in (no network in this sandbox); a real LLM/HTTP
call drops into ``fn``.

    ds.map_batches(RetryingUDFActor, concurrency=N, batch_size=B,
                   fn_constructor_kwargs={"fn": my_fn, "tries": 3})
"""

from __future__ import annotations

import time

import pyarrow as pa


def deterministic_rephrase(text: str) -> str:
    """Stand-in for the reference's LLM question rephrasing
    (reword_questions_multiprocessing.py:32-66): deterministic word
    reversal — stable, testable, obviously fake."""
    return " ".join(reversed((text or "").split()))


class RetryingUDFActor:
    def __init__(
        self,
        fn=deterministic_rephrase,
        *,
        text_col: str = "text",
        out_col: str = "udf_out",
        tries: int = 3,
        backoff_s: float = 0.0,
    ):
        self.fn = fn
        self.text_col = text_col
        self.out_col = out_col
        self.tries = tries
        self.backoff_s = backoff_s

    def _call_one(self, value):
        delay = self.backoff_s
        last = None
        for _ in range(self.tries):
            try:
                return self.fn(value), None
            except Exception as exc:  # retry then quarantine
                last = exc
                if delay:
                    time.sleep(delay)
                    delay *= 2
        return None, f"{type(last).__name__}: {last}"

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs, errs = [], []
        for v in batch.column(self.text_col).to_pylist():
            out, err = self._call_one(v)
            outs.append(out)
            errs.append(err)
        out = batch.append_column(self.out_col, pa.array(outs, pa.string()))
        return out.append_column("error", pa.array(errs, pa.string()))
