"""metro_config XML flattening, in-engine (SURVEY.md §2: S1-S3, F1-F6,
J1-J3, P5; reference GetHistoricalData at /root/reference/R/_pull_data.R:1-137).

The reference downloads a gzipped XML per day, XPath-walks
corridor -> r_node -> detector with xml2, extracts attribute lists per
level, positionally binds paths to attributes (J3), then left-joins rnode
and corridor attributes onto detectors (J1/J2). Here the whole flatten is
a single `from_xml` parse (built-in XML support, Spark 4) with a nested
schema mirroring the document hierarchy, followed by three explodes:

- `corridor -> r_node -> detector` arrays preserve document order AND
  parentage, so detector/rnode/corridor attributes align by construction —
  the fragile positional bind_cols and the two joins disappear. (A pure
  xpath() formulation is wrong here: XPath node-sets deduplicate, so
  `//detector/parent::r_node/@name` yields one entry per *distinct* node,
  misaligning with the per-detector arrays.)
- denormalization of parent attributes onto each detector row is exactly
  what the reference's two left equi-joins achieve (J1/J2);
- empty attribute values normalize to NULL (P5,
  /root/reference/R/_pull_data.R:142); malformed numerics parse to NULL
  (PERMISSIVE mode);
- SNAPSHOT_DATE is regexp-extracted from the source URL (F4, :115-120).

Scale: parsing is per-row (per daily snapshot document) and embarrassingly
parallel; a year of dailies is 365 rows fanned out to executors, each
parsed once JVM-side with no Python involvement. The flattened output is
the small dimension — broadcast from then on.

No DuckDB oracle (from_xml is Spark-only): covered by unit tests instead
(tests/test_config_xml.py), including round-trip into scd2_apply; the
driver records a rows-only check for the `config_xml_flatten` query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Nested schema mirroring the metro_config hierarchy; `_`-prefixed fields
# are XML attributes (the Spark XML source's default attributePrefix).
CONFIG_XML_SCHEMA = (
    "STRUCT<corridor: ARRAY<STRUCT<"
    "_route: STRING, _dir: STRING, "
    "r_node: ARRAY<STRUCT<"
    "_name: STRING, _n_type: STRING, _label: STRING, "
    "_lon: DOUBLE, _lat: DOUBLE, _lanes: INT, _s_limit: INT, "
    "_station_id: STRING, "
    "detector: ARRAY<STRUCT<"
    "_name: STRING, _label: STRING, _category: STRING, "
    "_lane: INT, _field: DOUBLE, _abandoned: STRING"
    ">>>>>>>"
)

# output column -> (exploded-level alias, attribute field, cast)
_OUT = [
    ("DETECTOR_NAME", "d._name", "string"),
    ("DETECTOR_LABEL", "d._label", "string"),
    ("DETECTOR_CATEGORY", "d._category", "string"),
    ("DETECTOR_LANE", "d._lane", "int"),
    ("DETECTOR_FIELD", "d._field", "double"),
    ("DETECTOR_ABANDONED", "d._abandoned", "string"),
    ("NODE_NAME", "rn._name", "string"),
    ("NODE_N_TYPE", "rn._n_type", "string"),
    ("NODE_LABEL", "rn._label", "string"),
    ("NODE_LON", "rn._lon", "double"),
    ("NODE_LAT", "rn._lat", "double"),
    ("NODE_LANES", "rn._lanes", "int"),
    ("NODE_S_LIMIT", "rn._s_limit", "int"),
    ("NODE_STATION_ID", "rn._station_id", "string"),
    ("CORRIDOR_ROUTE", "co._route", "string"),
    ("CORRIDOR_DIR", "co._dir", "string"),
]


def flatten_config_xml(snapshots: DataFrame,
                       url_col: str = "url", xml_col: str = "xml") -> DataFrame:
    """(url, xml-string) rows -> one flat row per detector per snapshot."""
    exploded = (
        snapshots
        .select(F.col(url_col), F.from_xml(xml_col, CONFIG_XML_SCHEMA).alias("doc"))
        .select(F.col(url_col), F.explode("doc.corridor").alias("co"))
        .select(F.col(url_col), F.col("co"), F.explode("co.r_node").alias("rn"))
        .select(F.col(url_col), F.col("co"), F.col("rn"),
                F.explode("rn.detector").alias("d"))
    )

    def norm(src: str, cast: str):
        c = F.col(src)
        if cast == "string":
            return F.when(c != "", c)          # P5: '' -> NULL
        return c.cast(cast)

    return exploded.select(
        *[norm(src, cast).alias(name) for name, src, cast in _OUT],
        F.to_date(
            F.regexp_extract(F.col(url_col), r"config_(\d{8})", 1), "yyyyMMdd"
        ).alias("SNAPSHOT_DATE"),
    )


def corridor_config_frame(cfg: DataFrame,
                          snapshot_date: str = "20230101") -> DataFrame:
    """Distributed synthesis of metro_config documents — ONE document per
    corridor, built entirely with aggregations (no driver collect): detector
    fragments -> sorted per-node concatenation -> sorted per-corridor
    concatenation. The downstream `from_xml` parse then fans out one task
    per corridor document, which is the scale shape of the real feed (a
    document per snapshot day, parsed independently per day/corridor).

    ``cfg``: (sensor, field_length, node_name, corridor_route) rows.
    Returns (url, xml) rows consumable by flatten_config_xml; the url
    embeds ``snapshot_date`` for the F4 date extraction.
    """
    det = cfg.select(
        "corridor_route", "node_name",
        F.struct(
            F.col("sensor"),
            F.format_string(
                '<detector name="%s" label="%s" category="" lane="1" '
                'field="%s" abandoned="f"/>',
                F.col("sensor"), F.col("sensor"), F.col("field_length"),
            ).alias("frag"),
        ).alias("d"),
    )
    nodes = (
        det.groupBy("corridor_route", "node_name")
        .agg(F.array_join(
            F.transform(F.array_sort(F.collect_list("d")), lambda x: x["frag"]),
            "").alias("dets"))
        .select(
            "corridor_route",
            F.struct(
                "node_name",
                F.format_string(
                    '<r_node name="%s" n_type="Station" label="%s-lbl" '
                    'lon="0.0" lat="0.0" lanes="2" s_limit="55" '
                    'station_id="%s">%s</r_node>',
                    F.col("node_name"), F.col("node_name"),
                    F.col("node_name"), F.col("dets"),
                ).alias("frag"),
            ).alias("n"),
        )
    )
    return (
        nodes.groupBy("corridor_route")
        .agg(F.array_join(
            F.transform(F.array_sort(F.collect_list("n")), lambda x: x["frag"]),
            "").alias("nodes_xml"))
        .select(
            F.format_string(
                "http://example.org/iris_xml/%s/metro_config_%s.xml.gz",
                F.col("corridor_route"), F.lit(snapshot_date),
            ).alias("url"),
            F.format_string(
                '<tms_config><corridor route="%s" dir="EB">%s'
                "</corridor></tms_config>",
                F.col("corridor_route"), F.col("nodes_xml"),
            ).alias("xml"),
        )
    )


def make_config_xml(detectors: list[dict]) -> str:
    """Deterministic metro_config-shaped document builder for tests/demos.

    ``detectors``: dicts with keys corridor, dir, node, n_type, lon, lat,
    lanes, s_limit, station, name, label, category, lane, field, abandoned.
    Grouped into corridor/r_node hierarchy in iteration order.
    """
    from collections import defaultdict

    corridors: dict[tuple, dict[tuple, list]] = defaultdict(lambda: defaultdict(list))
    for d in detectors:
        corridors[(d["corridor"], d["dir"])][
            (d["node"], d.get("n_type", "Station"), d.get("lon", 0.0),
             d.get("lat", 0.0), d.get("lanes", 2), d.get("s_limit", 55),
             d.get("station", ""))
        ].append(d)
    parts = ["<tms_config>"]
    for (route, cdir), nodes in corridors.items():
        parts.append(f'<corridor route="{route}" dir="{cdir}">')
        for (node, n_type, lon, lat, lanes, s_limit, station), dets in nodes.items():
            parts.append(
                f'<r_node name="{node}" n_type="{n_type}" label="{node}-lbl" '
                f'lon="{lon}" lat="{lat}" lanes="{lanes}" s_limit="{s_limit}" '
                f'station_id="{station}">'
            )
            for d in dets:
                parts.append(
                    f'<detector name="{d["name"]}" label="{d.get("label", "")}" '
                    f'category="{d.get("category", "")}" lane="{d.get("lane", 1)}" '
                    f'field="{d.get("field", 500.0)}" '
                    f'abandoned="{d.get("abandoned", "f")}"/>'
                )
            parts.append("</r_node>")
        parts.append("</corridor>")
    parts.append("</tms_config>")
    return "".join(parts)


def snapshot_frame(spark: SparkSession, docs: list[tuple[str, str]]) -> DataFrame:
    """Build the (url, xml) input frame from [(url, xml_string)]."""
    return spark.createDataFrame(docs, "url string, xml string")
