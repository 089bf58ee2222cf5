"""String-surgery column functions.

Re-expresses the reference's text transforms (reference dag.py:167-198):

- multi-label decode → boolean flags       (dag.py:167-181, C11)
- decimal-comma normalize + lat,lon concat (dag.py:184, C12)
- make/model split with the 'I/' import special case (dag.py:187-195, C13)

The multi-label decode replaces an ``iterrows()`` loop with a
higher-order ``exists`` over ``split()`` — pure Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# dag.py:167 — the 12 road-geometry labels decoded out of `tracado_via`,
# verbatim incl. the capital-V 'Interseção de Vias'.
TRACADO_LABELS = (
    "Aclive", "Declive", "Curva", "Em Obras", "Viaduto", "Reta",
    "Ponte", "Rotatória", "Interseção de Vias", "Desvio Temporário",
    "Retorno Regulamentado", "Túnel",
)


def multilabel_flag(multilabel_col: Column | str, label: str, sep: str = ";") -> Column:
    """True iff any ';'-token's first-3-chars appear inside ``label``.

    Fuzzy prefix match per dag.py:170-178: tolerates dirty tokens like
    'Acli' (truncated) and 'Aclive    ' (padded) documented at
    Análise.ipynb:1278+ ("Erros").  Higher-order ``exists`` — no UDF.
    """
    c = F.col(multilabel_col) if isinstance(multilabel_col, str) else multilabel_col
    tokens = F.split(c, sep)
    # Parity note: like the reference's `token[0:3] in label`, an empty
    # token matches every label (instr(label, '') == 1) — preserved.
    return F.exists(
        tokens,
        lambda t: F.instr(F.lit(label), F.substring(t, 1, 3)) > 0,
    )


def multilabel_flags(
    df: DataFrame,
    multilabel_col: str,
    labels: tuple[str, ...] = TRACADO_LABELS,
    sep: str = ";",
) -> DataFrame:
    """One boolean column per label (dag.py:167-181) — 12 withColumns, one pass."""
    return df.withColumns(
        {label: multilabel_flag(multilabel_col, label, sep) for label in labels}
    )


def normalize_decimal_comma(c: Column | str) -> Column:
    """',' → '.' via translate (literal, no regex-escape pitfalls; dag.py:184)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.translate(col, ",", ".")


def lat_log(lat_col: str, lon_col: str) -> Column:
    """Composite "lat,lon" string with normalized decimals (dag.py:184, C12)."""
    return F.concat_ws(
        ",", normalize_decimal_comma(lat_col), normalize_decimal_comma(lon_col)
    )


def split_make_model(df: DataFrame, marca_col: str = "marca") -> DataFrame:
    """Split 'MARCA/MODELO' → (marca, modelo) with the 'I/' import case.

    Reference semantics (dag.py:187-195), preserved exactly including the
    deliberate asymmetry: the *modelo* branch tests the first token
    ``== 'I'`` (dag.py:188) while the *marca* branch tests the first
    **character** ``[0] == 'I'`` (dag.py:190):

    - modelo = part after '/'; if part-before-'/' == 'I' (import form
      'I/TOYOTA COROLLA XEI'), modelo = space-tokens[2:] of the after-part.
    - marca = part before '/'; if it *starts with* 'I', marca = first
      space-token of the after-part.
    - nulls → 'não informado' (dag.py:194-195).
    """
    sp = F.split(F.col(marca_col), "/")
    before = F.element_at(sp, 1)
    after = F.element_at(sp, 2)
    after_toks = F.split(after, " ")
    modelo = F.when(
        before == "I",
        F.array_join(F.slice(after_toks, 2, 2147483647), " "),
    ).otherwise(after)
    marca = F.when(
        F.substring(before, 1, 1) == "I", F.element_at(after_toks, 1)
    ).otherwise(before)
    return (
        df.withColumn("modelo", modelo)
        .withColumn(marca_col, marca)
        .fillna("não informado", subset=[marca_col, "modelo"])
    )
