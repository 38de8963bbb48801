"""Shipped substrait extension relations.

Reference: Acero registers operators substrait has no standard rel for
— notably its as-of join — as extension rels routed through an
ExtensionProvider (cpp/src/arrow/engine/substrait/extension_set.h, and
options.h's AsofJoinNodeOptions for the payload shape). The consumer's
pluggable ``extension_handler`` hook is this repo's provider analog;
this module ships a concrete provider plus builder helpers so the hook
is exercised end to end in-repo, not just by ad-hoc test lambdas.

Payloads are JSON (engine-defined — substrait's Any value is opaque by
design): human-readable, versionable, and trivially cross-producible.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from arrow_spark.plans import substrait_builder as B

#: type_url of the as-of-join ExtensionMultiRel (inputs: [left, right]).
#: Payload: {"on": col, "by": [cols], "tolerance": signed number |
#: pandas-Timedelta string (sign = direction, Arrow options.h:711-724),
#: "suffix": str, "right_tiebreak": [cols]}.
ASOF_JOIN_URL = "arrow_spark/extensions/asof_join"

#: type_url of the EWMA ExtensionSingleRel. Payload: {"keys": [cols],
#: "order_by": [cols], "value_col": col, "halflives": int, "window":
#: int, "out_col": str} — operators/smoothing.py semantics (the
#: span-limited dyadic-exact EWMA).
EWMA_URL = "arrow_spark/extensions/ewma"

#: type_url of the 2-D skyline ExtensionSingleRel. Payload: {"groups":
#: [cols], "minimize": col, "maximize": col} — operators/skyline.py
#: semantics (window-algebra Pareto front, duplicates survive).
SKYLINE_URL = "arrow_spark/extensions/skyline_2d"


def asof_join_rel(
    left_rel: bytes,
    right_rel: bytes,
    on: str,
    by: list[str] | None = None,
    tolerance: float | str | None = None,
    suffix: str = "_r",
    right_tiebreak: list[str] | None = None,
) -> bytes:
    """Encode an as-of join as an ExtensionMultiRel (builder side)."""
    payload = json.dumps(
        {
            "on": on,
            "by": by or [],
            "tolerance": tolerance,
            "suffix": suffix,
            "right_tiebreak": right_tiebreak or [],
        },
        sort_keys=True,
    ).encode()
    return B.extension_multi_rel([left_rel, right_rel], ASOF_JOIN_URL, payload)


def engine_extension_handler(
    type_url: str, value: bytes, inputs: list[DataFrame]
) -> DataFrame:
    """The in-repo ExtensionProvider: resolves this engine's extension
    type_urls to operators. Pass as ``extension_handler=`` to
    run_substrait (kept opt-in so foreign extension rels still fail
    loudly rather than guessing)."""
    if type_url == ASOF_JOIN_URL:
        import pandas as pd

        from arrow_spark.operators.asof import _signed_to_direction, asof_join

        if len(inputs) != 2:
            raise ValueError(f"asof_join extension expects 2 inputs, got {len(inputs)}")
        opts = json.loads(value.decode())
        tol = opts.get("tolerance")
        if isinstance(tol, str):
            tol = pd.Timedelta(tol)
        direction, tol_abs = _signed_to_direction(tol)
        return asof_join(
            inputs[0],
            inputs[1],
            on=opts["on"],
            by=opts.get("by", []),
            tolerance=tol_abs,
            direction=direction,
            suffix=opts.get("suffix", "_r"),
            right_tiebreak=opts.get("right_tiebreak", ()),
        )
    if type_url == EWMA_URL:
        from arrow_spark.operators.smoothing import ewma

        if len(inputs) != 1:
            raise ValueError(f"ewma extension expects 1 input, got {len(inputs)}")
        opts = json.loads(value.decode())
        return ewma(
            inputs[0],
            keys=opts["keys"],
            order_by=opts["order_by"],
            value_col=opts["value_col"],
            halflives=opts.get("halflives", 1),
            window=opts.get("window", 32),
            out_col=opts.get("out_col", "ewma"),
        )
    if type_url == SKYLINE_URL:
        from pyspark.sql import functions as F

        from arrow_spark.operators.skyline import skyline_2d

        if len(inputs) != 1:
            raise ValueError(f"skyline extension expects 1 input, got {len(inputs)}")
        opts = json.loads(value.decode())
        return skyline_2d(
            inputs[0],
            group_cols=opts["groups"],
            minimize=F.col(opts["minimize"]),
            maximize=F.col(opts["maximize"]),
        )
    raise NotImplementedError(f"unknown extension relation {type_url!r}")


def ewma_rel(
    input_rel: bytes,
    keys: list[str],
    order_by: list[str],
    value_col: str,
    halflives: int = 1,
    window: int = 32,
    out_col: str = "ewma",
) -> bytes:
    """Encode a span-limited EWMA as an ExtensionSingleRel (builder
    side): output schema = input columns ++ [out_col]."""
    payload = json.dumps(
        {
            "keys": keys,
            "order_by": order_by,
            "value_col": value_col,
            "halflives": halflives,
            "window": window,
            "out_col": out_col,
        },
        sort_keys=True,
    ).encode()
    return B.extension_single_rel(input_rel, EWMA_URL, payload)


def skyline_rel(
    input_rel: bytes,
    groups: list[str],
    minimize: str,
    maximize: str,
) -> bytes:
    """Encode a 2-D skyline as an ExtensionSingleRel (builder side):
    output schema = input columns, rows filtered to the Pareto front."""
    payload = json.dumps(
        {"groups": groups, "minimize": minimize, "maximize": maximize},
        sort_keys=True,
    ).encode()
    return B.extension_single_rel(input_rel, SKYLINE_URL, payload)
