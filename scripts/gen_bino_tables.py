"""Regenerate datasketches_spark/sketches/_bino_tables.py.

Extracts the Apache DataSketches BinomialBoundsN helper tables from
the datasketches-java jar that ships inside pyspark (the same live
oracle the wire tests use): EquivTables.lbEquivTable / ubEquivTable —
the 360-entry "equivalent numSDev" tables used for 1 <= numSamples
<= 120 when theta < numSamples/360 (static public-domain data from
the Apache-2.0 project) — extracted once and committed so the runtime
has no JVM dependency.

Run: python scripts/gen_bino_tables.py   (rewrites the module in place)
"""

from __future__ import annotations

OUT = "datasketches_spark/sketches/_bino_tables.py"


def extract():
    from pyspark.java_gateway import launch_gateway

    gw = launch_gateway()
    jvm = gw.jvm
    cl = jvm.java.lang.Class.forName(
        "org.apache.datasketches.thetacommon.EquivTables"
    )

    def get(name):
        f = cl.getDeclaredField(name)
        f.setAccessible(True)
        return list(f.get(None))

    lb, ub = get("lbEquivTable"), get("ubEquivTable")
    gw.shutdown()
    return lb, ub


def fmt(name, vals):
    lines = [f"{name} = ("]
    row = []
    for v in vals:
        row.append(repr(float(v)))
        if len(row) == 4:
            lines.append("    " + ", ".join(row) + ",")
            row = []
    if row:
        lines.append("    " + ", ".join(row) + ",")
    lines.append(")")
    return "\n".join(lines)


def main():
    lb, ub = extract()
    # 3*121 = 363: indices 3*numSamples + numSDev-1 for 0 <= n <= 120
    assert len(lb) == 363 and len(ub) == 363, (len(lb), len(ub))
    body = (
        '"""Apache BinomialBoundsN equivalent-numSDev tables '
        "(GENERATED — do not edit).\n\n"
        "Extracted from datasketches-java's "
        "org.apache.datasketches.thetacommon.EquivTables by\n"
        "scripts/gen_bino_tables.py; indexed [3*numSamples + numSDev - 1] "
        "for\n0 <= numSamples <= 120.\n"
        '"""\n\n'
        + fmt("LB_EQUIV", lb)
        + "\n\n"
        + fmt("UB_EQUIV", ub)
        + "\n"
    )
    with open(OUT, "w") as f:
        f.write(body)
    print(f"wrote {OUT}: {len(lb)}+{len(ub)} doubles")


if __name__ == "__main__":
    main()
