"""Legend/class-break computation (SURVEY §2.7).

The reference computes equal-interval class breaks over a rating's
min/max for map legends (GetNumericLegend, gSSURGO_CreateSoilMap.py
:1234-1493; ClassBreaksJSON :2088-2340). The break computation is a
2-row aggregate plus a generated class index — no data-sized work
beyond the min/max scan — and since round 12b the esriJSON
layer-definition STRING itself is constructed too
(class_breaks_layer_json); only the .lyr/.mxd binary containers stay
out of scope (ArcGIS-proprietary formats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equal_interval_breaks(df: DataFrame, col: str, n_classes: int = 5) -> DataFrame:
    """(class_idx, brk) — n_classes+1 equal-interval break points over
    [min, max] of ``col``. Integer inputs stay in exact integer
    arithmetic (min + ((max-min)·i) div n), engine-reproducible."""
    s = df.agg(F.min(F.col(col)).alias("mn"), F.max(F.col(col)).alias("mx"))
    return (
        s.select(
            F.explode(F.sequence(F.lit(0), F.lit(n_classes))).alias("class_idx"),
            "mn",
            "mx",
        )
        .select(
            "class_idx",
            F.expr(f"mn + ((mx - mn) * class_idx) div {n_classes}").alias("brk"),
        )
    )


def unique_values(df: DataFrame, col: str) -> DataFrame:
    """(value, n) per distinct rating — the computation core of the
    reference's unique-values legend (UniqueValuesJSON,
    gSSURGO_CreateSoilMap.py:2341-2518) and of the outputValues list
    every Aggregate* function returns for legend building."""
    return df.groupBy(F.col(col).alias("value")).agg(
        F.count(F.lit(1)).alias("n")
    )


_OUTLINE_JSON = (
    '{"type": "esriSLS", "style": "esriSLSSolid", '
    '"color": [0, 0, 0, 0], "width": 0.4}'
)

_CLASS_COLORS = [
    "[255, 0, 0, 255]",     # red
    "[255, 255, 0, 255]",   # yellow
    "[0, 255, 0, 255]",     # green
    "[0, 255, 255, 255]",   # cyan
    "[0, 0, 255, 255]",     # blue
]


def fmt_e2(v):
    """Integer hundredths → canonical 2-decimal JSON number text
    ("1234" → "12.34", "500" → "5.00"). The reference prints Python-2
    ``str(round(x, 2))`` ("10.0", "10.25"); this repo pins a FIXED
    2-decimal rendering instead so the text is reproducible from
    exact integers in any engine (documented deviation — the numeric
    VALUES are identical). Non-negative inputs only."""
    return F.concat(
        (v / 100).cast("long").cast("string"),
        F.lit("."),
        F.lpad((v % 100).cast("string"), 2, "0"),
    )


def class_breaks_layer_json(field, min_e2, max_e2):
    """The esriJSON layer-definition STRING for a classified numeric
    rating — ClassBreaksJSON (gSSURGO_CreateSoilMap.py:2088-2340)
    rebuilt as one Column expression: 5 equal-interval classes (1
    when the rating is constant, :2219-2223), step = round((max −
    min)/classNum, 2) (:2229 — in integer hundredths the /5 fraction
    is never .5, so HALF_UP vs half-away cannot diverge), the
    reference's label scheme ("<= high" for the first class, "> low
    and <= high" after, :2236-2256 uom-less branch), the standard
    red→yellow→green→cyan→blue color order (:2204-2210), the
    transparent outline (:2202-2205 drawOutlines=False), and the
    renderer envelope with classificationMethod esriClassifyManual
    (:2268-2273) wrapped in drawingInfo (:2320-2323).

    Deviations, pinned deliberately: numbers render with exactly 2
    decimals (see fmt_e2) and object keys emit in the reference's
    conceptual order (Python-2 dict iteration order — what the
    reference actually serialized — was unspecified). Pure map-side
    string construction over an already-aggregated (field, min, max)
    row; the JSON a user feeds to the ArcGIS REST renderer."""
    mn, mx = min_e2.cast("long"), max_e2.cast("long")
    n = F.when(mn == mx, F.lit(1)).otherwise(F.lit(5))
    step = F.round((mx - mn) / n.cast("double")).cast("long")
    colors = F.array(*[F.lit(c) for c in _CLASS_COLORS])

    def info(i):
        low = mn + i * step
        high = low + step
        label = F.when(
            i == 0, F.concat(F.lit("<= "), fmt_e2(high))
        ).otherwise(
            F.concat(
                F.lit("> "), fmt_e2(low), F.lit(" and <= "), fmt_e2(high)
            )
        )
        return F.concat(
            F.lit('{"classMinValue": '), fmt_e2(low),
            F.lit(', "classMaxValue": '), fmt_e2(high),
            F.lit(', "label": "'), label,
            F.lit('", "description": "", "outline": '),
            F.lit(_OUTLINE_JSON),
            F.lit(', "symbol": {"type": "esriSFS", "style": '
                  '"esriSFSSolid", "color": '),
            F.element_at(colors, (i + 1).cast("int")),
            F.lit(', "outline": '), F.lit(_OUTLINE_JSON), F.lit("}}"),
        )

    infos = F.transform(F.sequence(F.lit(0), n - 1), info)
    return F.concat(
        F.lit('{"drawingInfo": {"renderer": {"type": "classBreaks", '
              '"classificationMethod": "esriClassifyManual", "field": "'),
        field,
        F.lit('", "minValue": '), fmt_e2(mn),
        F.lit(', "classBreakInfos": ['),
        F.array_join(infos, ", "),
        F.lit("]}}}"),
    )


_UV_OUTLINE = (
    '{"color": [0, 0, 0, 0], "width": 0.4, '
    '"style": "esriSLSSolid", "type": "esriSLS"}'
)
_UV_NO_OUTLINE = (
    '{"color": [0, 0, 0, 0], "width": 0.0, '
    '"style": "esriSLSSolid", "type": "esriSLS"}'
)


def unique_values_layer_json(field1, sorted_values):
    """The esriJSON layer definition for a UNIQUE-VALUES (categorical)
    legend — UniqueValuesJSON (gSSURGO_CreateSoilMap.py:2341-2518)
    rebuilt as one Column expression over an already-aggregated sorted
    value array (a DOMAIN — bounded by construction, so the collect
    that feeds this is broadcast-sized at any data scale):

    - one uniqueValueInfos item per rating (value/description ""/
      label == value/symbol with the transparent outline,
      drawOutlines=False :2358-2367);
    - the 'Not rated' item — dark-gray fill [110,110,110,255],
      zero-width outline (the Interpretation branch :2412-2419);
    - the '<Null>' item labeled "Null" — light-gray fill
      [175,175,175,255], zero-width outline (:2421-2429);
    - the renderer envelope in the reference's insertion order:
      uniqueValueInfos, type, field1, field2 "", field3 "",
      fielddelimiter ";" (:2431-2438), wrapped in drawingInfo.

    Colors cycle through the standard 5-color list by the value's
    rank in the SORTED domain (the reference receives its colors from
    an upstream ramp; the cycling rule makes the assignment a pure
    function of the domain — documented repo convention). Values must
    not need JSON escaping (SSURGO domain strings are letters,
    digits, spaces, hyphens — true for every rating domain in the
    metadata catalog)."""
    colors = F.array(*[F.lit(c) for c in _CLASS_COLORS])

    def item(v, i):
        return F.concat(
            F.lit('{"value": "'), v,
            F.lit('", "description": "", "label": "'), v,
            F.lit('", "symbol": {"type": "esriSFS", "style": '
                  '"esriSFSSolid", "color": '),
            F.element_at(colors, (i % 5 + 1).cast("int")),
            F.lit(', "outline": '), F.lit(_UV_OUTLINE), F.lit("}}"),
        )

    infos = F.transform(sorted_values, item)
    not_rated = (
        '{"value": "Not rated", "description": "", "label": "Not rated", '
        '"symbol": {"type": "esriSFS", "style": "esriSFSSolid", '
        '"color": [110, 110, 110, 255], "outline": '
        + _UV_NO_OUTLINE + "}}"
    )
    null_item = (
        '{"value": "<Null>", "description": "", "label": "Null", '
        '"symbol": {"type": "esriSFS", "style": "esriSFSSolid", '
        '"color": [175, 175, 175, 255], "outline": '
        + _UV_NO_OUTLINE + "}}"
    )
    return F.concat(
        F.lit('{"drawingInfo": {"renderer": {"uniqueValueInfos": ['),
        F.array_join(infos, ", "),
        F.lit(", " + not_rated + ", " + null_item),
        F.lit('], "type": "uniqueValue", "field1": "'),
        field1,
        F.lit('", "field2": "", "field3": "", "fielddelimiter": ";"}}}'),
    )


def defined_breaks_layer_json(field, min_value, breaks):
    """The esriJSON layer definition for DEFINED break values —
    DefinedBreaksJSON (gSSURGO_CreateSoilMap.py:2520-2652, "Use this
    for Hydric, pH"): unlike the computed equal-interval legend, the
    class bounds come from the SDV metadata (maplegendxml), so they
    arrive here as the static ``breaks`` list of (lo, hi, label)
    integers; ``min_value`` is the data-derived renderer minValue
    (:2583). Item key order follows the reference's insertion order
    (:2610-2647): classMinValue, classMaxValue, label, description,
    symbol, then the ITEM-level outline duplicate (dLegend["outline"],
    :2646); colors cycle the standard list; the envelope is the
    classBreaks renderer. Integer bounds render as plain JSON
    integers (Hydric's are). Pure map-side string construction."""
    items = []
    for i, (lo, hi, label) in enumerate(breaks):
        items.append(
            '{"classMinValue": %d, "classMaxValue": %d, "label": "%s", '
            '"description": "", "symbol": {"type": "esriSFS", "style": '
            '"esriSFSSolid", "color": %s, "outline": %s}, "outline": %s}'
            % (lo, hi, label, _CLASS_COLORS[i % 5],
               _OUTLINE_JSON, _OUTLINE_JSON)
        )
    return F.concat(
        F.lit('{"drawingInfo": {"renderer": {"type": "classBreaks", '
              '"classificationMethod": "esriClassifyManual", "field": "'),
        field,
        F.lit('", "minValue": '),
        min_value.cast("long").cast("string"),
        F.lit(', "classBreakInfos": [' + ", ".join(items) + "]}}}"),
    )
