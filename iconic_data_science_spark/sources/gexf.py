"""GEXF network serialization (G8).

The reference templates GEXF XML strings node-by-node on the driver and
writes a single text file
(/root/reference/src/notebooks/scala/StaticNet.scala:451-465,473;
jsNets.scala:83-97 reads them back for D3 rendering). Re-expressed
Spark-side: per-row ``format_string`` → sorted ``collect_list`` →
``concat_ws`` assembly, so the XML fragments are built distributed and
only the final (small) document string ever exists in one place. Output
is deterministic (fragments sorted) — same graph, same bytes.

For huge graphs write the fragment DataFrame with
``df.coalesce(1).write.text`` (S8, jsNets.scala:106) instead of
assembling one string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">\n'
    '<graph mode="static" defaultedgetype="undirected">\n'
)
_FOOTER = "</graph>\n</gexf>"


def node_fragments(nodes: DataFrame, id_col: str = "id", label_col: str | None = None) -> DataFrame:
    label = F.col(label_col) if label_col else F.col(id_col)
    return nodes.select(
        F.format_string('<node id="%s" label="%s" />', F.col(id_col).cast("string"), label.cast("string")).alias(
            "fragment"
        )
    )


def edge_fragments(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst", weight_col: str | None = None
) -> DataFrame:
    weight = (F.col(weight_col) if weight_col else F.lit(1)).cast("string")
    return edges.select(
        F.format_string(
            '<edge source="%s" target="%s" weight="%s" />',
            F.col(src_col).cast("string"),
            F.col(dst_col).cast("string"),
            weight,
        ).alias("fragment")
    )


def _assemble(frags: DataFrame) -> "F.Column":
    return F.concat_ws("\n", F.array_sort(F.collect_list("fragment")))


def to_gexf(nodes_frag: DataFrame, edges_frag: DataFrame) -> DataFrame:
    """One-row DataFrame [gexf: string] — the assembled document."""
    n = nodes_frag.agg(_assemble(nodes_frag).alias("nodes_xml"))
    e = edges_frag.agg(_assemble(edges_frag).alias("edges_xml"))
    return n.crossJoin(e).select(
        F.concat(
            F.lit(_HEADER),
            F.lit("<nodes>\n"),
            F.col("nodes_xml"),
            F.lit("\n</nodes>\n<edges>\n"),
            F.col("edges_xml"),
            F.lit("\n</edges>\n"),
            F.lit(_FOOTER),
        ).alias("gexf")
    )


def to_d3_json(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """One-row DataFrame [d3: string] — the jsNets surface
    (/root/reference/src/notebooks/scala/jsNets.scala renders GEXF nets
    with embedded D3): ``{"nodes":[{"id":...}],"links":[{"source":...,
    "target":...,"value":...}]}``, deterministically ordered.

    ``nodes``: (id); ``edges``: (src, dst, weight).
    """
    node_json = nodes.agg(
        F.concat_ws(
            ",",
            F.array_sort(F.collect_list(F.format_string('{"id":%s}', F.col("id").cast("string")))),
        ).alias("nodes_json")
    )
    edge_json = edges.agg(
        F.concat_ws(
            ",",
            F.array_sort(
                F.collect_list(
                    F.format_string(
                        '{"source":%s,"target":%s,"value":%s}',
                        F.col("src").cast("string"),
                        F.col("dst").cast("string"),
                        F.col("weight").cast("string"),
                    )
                )
            ),
        ).alias("links_json")
    )
    return node_json.crossJoin(edge_json).select(
        F.concat(
            F.lit('{"nodes":['),
            F.col("nodes_json"),
            F.lit('],"links":['),
            F.col("links_json"),
            F.lit("]}"),
        ).alias("d3")
    )


def write_gexf_single_file(gexf_df: DataFrame, path: str) -> None:
    """S8 single-file text sink (coalesce(1), jsNets.scala:106)."""
    gexf_df.select(F.col("gexf").alias("value")).coalesce(1).write.mode("overwrite").text(path)
