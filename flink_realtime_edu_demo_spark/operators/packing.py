"""Greedy close-on-overflow sequence packing (first-fit, in-order).

The training-loader packing step when documents must not split: within
each stream (key), documents are taken in a fixed order and appended to
the current bin; a bin closes when the next document would push it past
the token budget. Bin state depends on every prior document, so this is
inherently a stateful sequential scan — the batch analog of a Flink
keyed ProcessFunction — and lowers to ``applyInPandas`` per key: groups
are independent, parallelism = stream count, each group is one Arrow
batch scanned once in pandas.

Semantics (per key, rows in ``order_col`` order):
- bin 0 starts empty; a document lands in the current bin if
  ``fill + n_tok <= budget`` or the bin is empty;
- otherwise the bin closes and the document opens the next bin;
- a document larger than the budget therefore gets a bin of its own
  (it lands in an empty bin, and the next document closes it).

At 100 TB a single giant stream would serialize — shard the key first
(or use the fully-parallel concatenate-then-chunk layout of
``q_llm_pack_chunks``, a pure running-sum window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def greedy_pack(
    df: DataFrame,
    budget: int,
    key_col: str = "source",
    order_col: str = "doc_id",
    tok_col: str = "n_tok",
) -> DataFrame:
    """First-fit packing of ``df`` rows into ``budget``-token bins per
    ``key_col`` stream, in ``order_col`` order. Returns the input
    columns plus ``bin_id`` (0-based per key) and ``fill_after`` (bin
    token total after placing the row). Output schema keeps only
    (order_col, key_col, tok_col) of the input — with their input types,
    whatever they are — project first if more columns are needed
    downstream (join back on order_col)."""
    in_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = (
        f"{order_col} {in_types[order_col]}, {key_col} {in_types[key_col]}, "
        f"{tok_col} {in_types[tok_col]}, bin_id long, fill_after long"
    )

    def pack(pdf):
        if pdf[tok_col].isna().any() or pdf[order_col].isna().any():
            raise ValueError(
                f"greedy_pack requires non-null {tok_col!r} and {order_col!r} "
                f"(key={pdf[key_col].iloc[0]!r})"
            )
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        bin_ids, fills = [], []
        bin_id, fill = 0, 0
        for n in pdf[tok_col]:
            if fill > 0 and fill + n > budget:
                bin_id += 1
                fill = 0
            fill += int(n)
            bin_ids.append(bin_id)
            fills.append(fill)
        pdf = pdf[[order_col, key_col, tok_col]].copy()
        pdf["bin_id"] = bin_ids
        pdf["fill_after"] = fills
        return pdf

    return df.groupBy(key_col).applyInPandas(pack, out_schema)
