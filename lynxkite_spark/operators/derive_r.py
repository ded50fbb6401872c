"""DeriveR — user R code over table columns, executed per Arrow batch.

Reference: DeriveR.scala (all of it) — R snippets with declared input /
output fields, executed by the sphynx server's R runner, gated by the
``KITE_ALLOW_R`` environment switch (DeriveR.scala:38-47) and typed via
``toSerializableType`` (DeriveR.scala:50-57: character→string,
double→double, integer→long, vector→vector<double>).

Spark-first shape: the reference ships the whole attribute to one R
process; here the user code runs inside ``mapInPandas`` — each Arrow
batch is handed to an ``Rscript`` subprocess as a CSV data.frame named
``vs``, the declared output columns are read back and cast to the
declared Spark types. The R process is per-batch and per-executor, so
the operator scales exactly like every other mapInPandas op (bounded
batch memory, no driver involvement); the CSV hop is the honest
lowest-common-denominator transport for an environment where the R
arrow package cannot be assumed.

Environment gate: this sandbox has no R installation, so the executable
check raises a documented EnvironmentError — the same contract-tested
seam as the jar-blocked lakehouse connectors (sources/io.py). The
``KITE_ALLOW_R`` security switch is enforced with the reference's exact
semantics BEFORE the executable check: yes → allowed, no/unset →
refused, anything else → hard error.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame

R_TYPE_TO_SPARK = {
    "character": "string",
    "double": "double",
    "integer": "long",
    "vector": "array<double>",
}

# the reference's output-declaration grammar (DeriveR.scala:60-70):
# "<table>.<name>: <type>", e.g. "vs.score: double"
_OUTPUT_DECL = re.compile(r"(\w+)\.(\w+)\s*:\s*([a-zA-Z0-9.]+)")


def parse_output_fields(declarations: list[str]) -> list[tuple[str, str]]:
    """Parse ``["vs.score: double", ...]`` declarations into
    (name, r_type) pairs — DeriveR.scala:60-70's outputFields, minus the
    metagraph parent resolution (this engine's tables are flat)."""
    out = []
    for decl in declarations:
        m = _OUTPUT_DECL.fullmatch(decl.strip())
        if not m:
            raise ValueError(
                f"cannot parse output declaration {decl!r}; expected "
                f"'<table>.<name>: <type>' like 'vs.score: double'"
            )
        _, name, rtype = m.groups()
        if rtype not in R_TYPE_TO_SPARK:
            raise ValueError(
                f"unknown R output type {rtype!r} (DeriveR.scala:50-57 "
                f"allows: {sorted(R_TYPE_TO_SPARK)})"
            )
        out.append((name, rtype))
    return out


def r_allowed() -> bool:
    """The reference's KITE_ALLOW_R switch, exact semantics
    (DeriveR.scala:38-47): 'yes' → True, 'no' or unset → False, any
    other value → hard error."""
    v = os.environ.get("KITE_ALLOW_R", "")
    if v == "yes":
        return True
    if v in ("no", ""):
        return False
    raise ValueError(
        f"KITE_ALLOW_R must be either 'yes' or 'no'. Found '{v}'."
    )


def _r_wrapper(code: str, out_fields: list[tuple[str, str]]) -> str:
    """The per-batch R driver script: read the batch CSV as ``vs``, run
    the user code (which assigns columns on ``vs``), write the declared
    outputs back as CSV. vector outputs are ';'-joined per row (split +
    cast on the Spark side)."""
    cols = []
    for name, rtype in out_fields:
        if rtype == "vector":
            cols.append(
                f"out${name} <- sapply(vs${name}, "
                f"function(x) paste(x, collapse=';'))"
            )
        else:
            cols.append(f"out${name} <- vs${name}")
    assign = "\n".join(cols)
    return f"""
args <- commandArgs(trailingOnly = TRUE)
vs <- read.csv(args[1], stringsAsFactors = FALSE)
{code}
out <- data.frame(row.names = seq_len(nrow(vs)))
{assign}
write.csv(out, args[2], row.names = FALSE)
"""


def derive_r(
    df: DataFrame,
    code: str,
    outputs: list[str],
    input_cols: list[str] | None = None,
) -> DataFrame:
    """Run user R ``code`` over the table, per Arrow batch.

    ``code`` sees the batch as a data.frame named ``vs`` and assigns its
    output columns onto it (``vs$score <- vs$x * 2``); ``outputs``
    declares them reference-style (``["vs.score: double"]``). Returns a
    DataFrame of exactly the declared output columns.

    Raises EnvironmentError when no ``Rscript`` executable exists (this
    sandbox — the documented env-blocked seam) and refuses to run at all
    unless ``KITE_ALLOW_R=yes`` (the reference's security gate,
    DeriveR.scala:44-47).
    """
    if not r_allowed():
        raise PermissionError(
            "R code execution is disabled on this server for security "
            "reasons. Set KITE_ALLOW_R=yes to enable (DeriveR.scala:44-47)."
        )
    out_fields = parse_output_fields(outputs)
    rscript = shutil.which("Rscript")
    if rscript is None:
        raise EnvironmentError(
            "DeriveR needs an Rscript executable on every executor; none "
            "found on PATH in this environment. The operator surface and "
            "batch protocol are implemented and contract-tested; install "
            "R to activate (same env-blocked seam as the lakehouse "
            "connectors, sources/io.py)."
        )
    schema = ", ".join(
        f"{name} {R_TYPE_TO_SPARK[rtype]}" for name, rtype in out_fields
    )
    wrapper = _r_wrapper(code, out_fields)
    src = df.select(*input_cols) if input_cols else df

    def run(batches):
        import subprocess
        import tempfile

        import pandas as pd

        for pdf in batches:
            with tempfile.TemporaryDirectory() as d:
                inp = os.path.join(d, "in.csv")
                outp = os.path.join(d, "out.csv")
                script = os.path.join(d, "script.R")
                pdf.to_csv(inp, index=False)
                with open(script, "w") as f:
                    f.write(wrapper)
                subprocess.run(
                    [rscript, "--vanilla", script, inp, outp],
                    check=True, capture_output=True,
                )
                out = pd.read_csv(outp)
            for name, rtype in out_fields:
                if rtype == "vector":
                    out[name] = out[name].map(
                        lambda s: [float(x) for x in str(s).split(";")]
                        if pd.notna(s) else None
                    )
                elif rtype == "integer":
                    out[name] = out[name].astype("Int64")
            yield out[[n for n, _ in out_fields]]

    return src.mapInPandas(run, schema=schema)
