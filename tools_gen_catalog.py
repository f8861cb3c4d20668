"""Generate docs/OPERATORS.md from the query registry (single source of
truth: the @register calls). Run: python tools_gen_catalog.py"""

import sys

sys.path.insert(0, "/root/repo")


def render() -> str:
    from iceberg_file_writer_spark.queries import all_queries, driver_queries

    qs = all_queries()
    exposed = set(driver_queries())
    lines = [
        "# Operator catalog",
        "",
        "Generated from the query registry (`iceberg_file_writer_spark/queries/`)",
        "by `tools_gen_catalog.py` — do not edit by hand. Every operator is a",
        "`queries()` entry callable as `fn(spark, sf_dir) -> DataFrame`;",
        "*oracle* means an equivalent DuckDB SQL program is registered and",
        "pytest checks value-hash parity at sf0.001 (and, in escalation runs,",
        "sf0.01 / sf0.1). *driver slot* marks the 50 entries on the driver's",
        "capped correctness surface this round.",
        "",
        f"**{len(qs)} operators** ({sum(1 for q in qs.values() if q.oracle)} "
        f"oracle-paired, {len(exposed)} driver slots).",
        "",
        "| operator | oracle | driver slot | description |",
        "|---|---|---|---|",
    ]
    for name in sorted(qs):
        q = qs[name]
        desc = " ".join(q.description.split()) or "—"
        lines.append(
            f"| `{name}` | {'yes' if q.oracle else 'rows-only'} "
            f"| {'yes' if name in exposed else ''} | {desc} |"
        )
    lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    out = "/root/repo/docs/OPERATORS.md"
    with open(out, "w") as f:
        f.write(render())
    print(f"wrote {out}")
