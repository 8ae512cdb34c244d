"""Spark scan-side GML decode: XML documents → typed geometry columns.

The reference's front door is GML DOM (``GmlUtils.java:414-433``
unmarshalGMLGeometry); here the equivalent is a scan stage: read XML
documents distributed (``spark.read.text(wholetext)`` — one row per
file — or any string column), then one Arrow-batched pandas UDF running
the :mod:`kernels.gml` decode + flattening per document.  Downstream
stages see only typed columns (kind, crs, counts, envelope, flattened
coords) — the XML never crosses another stage boundary.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import gml as gml_k

GML_DECODE_SCHEMA = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("crs", T.StringType()),
    T.StructField("n_points", T.IntegerType()),
    T.StructField("first_x", T.DoubleType()),
    T.StructField("first_y", T.DoubleType()),
    T.StructField("last_x", T.DoubleType()),
    T.StructField("last_y", T.DoubleType()),
    T.StructField("xmin", T.DoubleType()),
    T.StructField("ymin", T.DoubleType()),
    T.StructField("xmax", T.DoubleType()),
    T.StructField("ymax", T.DoubleType()),
    T.StructField("n_interior_rings", T.IntegerType()),
    T.StructField("n_interior_points", T.IntegerType()),
    T.StructField("error", T.StringType()),
])


def _decode_one(xml_text: str) -> dict:
    import numpy as np

    try:
        elem = gml_k.unwrap_property(gml_k.parse(xml_text))
        gml_k.set_srs_name_on_collection_members(elem)
        kind = gml_k._local(elem.tag)
        crs = gml_k.find_crs_reference(elem, elem)
        if kind == "Envelope":
            env = gml_k.create_envelope(xml_text)
            coords = np.array([env["lower"], env["upper"]], dtype=np.float64)
            crs = env["crs"]
        else:
            coords = gml_k.geometry_coordinate_list(elem)
        try:
            interiors = (
                gml_k.surface_interior_boundaries(elem)
                if kind not in gml_k.CURVE_KINDS and kind != "Point"
                else []
            )
        except Exception:  # noqa: BLE001 - curves/points have no interiors
            interiors = []
        return {
            "kind": kind,
            "crs": crs,
            "n_points": int(len(coords)),
            "first_x": float(coords[0, 0]),
            "first_y": float(coords[0, 1]),
            "last_x": float(coords[-1, 0]),
            "last_y": float(coords[-1, 1]),
            "xmin": float(coords[:, 0].min()),
            "ymin": float(coords[:, 1].min()),
            "xmax": float(coords[:, 0].max()),
            "ymax": float(coords[:, 1].max()),
            "n_interior_rings": len(interiors),
            "n_interior_points": int(len(interiors[0])) if interiors else 0,
            "error": None,
        }
    except Exception as exc:  # noqa: BLE001 - malformed docs become error rows
        return {
            "kind": None, "crs": None, "n_points": None,
            "first_x": None, "first_y": None, "last_x": None, "last_y": None,
            "xmin": None, "ymin": None, "xmax": None, "ymax": None,
            "n_interior_rings": None, "n_interior_points": None,
            "error": str(exc)[:500],
        }


@F.pandas_udf(GML_DECODE_SCHEMA)
def gml_decode_udf(xml: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([_decode_one(x) for x in xml])


def decode_gml(df: DataFrame, xml_col: str = "xml", out: str = "geom") -> DataFrame:
    """Append the decoded-geometry struct column for a GML string column."""
    return df.withColumn(out, gml_decode_udf(F.col(xml_col)))


def read_gml_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """(path, xml) rows — one per XML document, read distributed."""
    return (
        spark.read.text(path_glob, wholetext=True)
        .select(
            F.input_file_name().alias("path"),
            F.col("value").alias("xml"),
        )
    )
