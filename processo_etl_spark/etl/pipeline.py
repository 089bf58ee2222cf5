"""The reference ETL DAG as ONE lazy Spark program.

Reference shape (dag.py): per-year merge → clean → transform, 5 CSV
materializations per lane, union, star schema, row-wise Postgres load.
Spark shape: the whole chain is a single DataFrame lineage per year,
unioned lazily; the only actions are the two-pass medians and the sink
writes.  Persist only the post-union table (re-read 6× by the star
builder, dag.py:220-261).

Stage map (SURVEY §2 ids in parens):

  merge_year      J1 right join + D1 dedup + P2 drops       (dag.py:44-57)
  clean           C9 imputation, C10 domains, F1-F3 filters (dag.py:59-129)
  transform       C1-C8, C11-C14 derivations                (dag.py:131-202)
  union_years     U1                                        (dag.py:204-213)
  build_star      D2/D3, W1, J2-J6, C18/C19                 (dag.py:215-287)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from processo_etl_spark.etl import holidays_br, schemas
from processo_etl_spark.functions import cleaning, derive, text
from processo_etl_spark.operators import relational, star
from processo_etl_spark.sources import readers

# dim_rodovia label→column renames, accents stripped (dag.py:265-280, C18).
TRACADO_RENAMES = {
    "Aclive": "aclive", "Declive": "declive", "Curva": "curva",
    "Em Obras": "em_obras", "Viaduto": "viaduto", "Reta": "reta",
    "Ponte": "ponte", "Rotatória": "rotatoria",
    "Interseção de Vias": "intersecao_vias",
    "Desvio Temporário": "desvio_temporario",
    "Retorno Regulamentado": "retorno_regulamentado", "Túnel": "tunel",
}

DIM_TEMPO_KEY = [
    "hora", "dia", "mes", "ano", "trimestre", "fase_dia", "dia_semana",
    "feriado", "dia_util",
]
DIM_RODOVIA_KEY = ["rodovia", "posicao_rodovia", "sentido_via", "uso_solo",
                   "tipo_pista", *TRACADO_RENAMES.values()]
DIM_LOCAL_KEY = ["uf", "municipio", "delegacia", "lat_log"]
DIM_DESCRITIVO_KEY = [
    "causa_acidente", "tipo_acidente", "classificacao_acidente",
    "condicao_metereologica",
]
DIM_VEICULO_KEY = ["tipo_veiculo", "marca", "modelo", "ano_fabricacao_veiculo"]


@dataclass
class StarSchema:
    dim_tempo: DataFrame
    dim_rodovia: DataFrame
    dim_local: DataFrame
    dim_descritivo: DataFrame
    dim_veiculo: DataFrame
    fato_acidentes: DataFrame


def merge_year(ocorrencia: DataFrame, causas: DataFrame) -> DataFrame:
    """J1+D1+P2 (dag.py:44-57): project causas, right join on id, dedup, drop."""
    merged = relational.right_outer_join(
        causas,
        ocorrencia,
        on="id",
        project_left=["id", "tipo_veiculo", "marca", "ano_fabricacao_veiculo"],
    )
    deduped = relational.dedup_keep_first(merged, ["id"], order_by=["tipo_veiculo", "marca"])
    return deduped.drop(*schemas.DROP_AFTER_MERGE)


def clean(df: DataFrame) -> DataFrame:
    """dag.py:59-129: parse, impute, validate domains, filter constraints."""
    out = df.withColumn("data_inversa", F.to_date("data_inversa"))
    out = out.withColumn("hora", F.hour(F.to_timestamp("horario", "HH:mm:ss")))
    # C9/A1: null/0 → median (two-pass literal injection; the reference's
    # ano median excludes != 0, dag.py:79).
    out = cleaning.impute_median(out, ["ano_fabricacao_veiculo"], exclude="nonzero")
    # C9: null sentinels.
    out = cleaning.fill_sentinels(
        out,
        numeric_minus1=["br"],
        text_not_informed=[*schemas.TEXT_FILL_COLS, "tipo_veiculo"],
    )
    out = out.fillna({"km": "-1"})
    # C10/F5: 7 domain allow-lists.
    out = cleaning.apply_domains(out, schemas.DOMAINS)
    # F1/F2: cross-field constraints.
    out = cleaning.constraint_filter_le(out, "mortos", "pessoas")
    out = cleaning.constraint_filter_le(out, "feridos", "pessoas")
    # dag.py:122-127: 0-markers in pessoas/veiculos → median of >0 subset.
    out = cleaning.impute_median(out, ["pessoas", "veiculos"])
    return out


def transform(df: DataFrame, holidays_df: DataFrame) -> DataFrame:
    """dag.py:131-202: derive, decode, split; drop consumed source cols."""
    parts = derive.date_parts("data_inversa")
    out = df.withColumns(
        {
            "dia": parts["dia"],
            "ano": parts["ano"],
            "trimestre": parts["trimestre"],
            "mes": derive.month_name_pt("data_inversa"),
            "fase_dia": derive.fase_dia("hora"),
            "dia_util": derive.dia_util("dia_semana"),
            "uso_solo": derive.recode("uso_solo", {"Não": "Rural", "Sim": "Urbano"}),
            "lat_log": text.lat_log("latitude", "longitude"),
        }
    )
    out = derive.with_holiday_flag(out, "data_inversa", holidays_df, out_col="feriado")
    out = text.multilabel_flags(out, "tracado_via")
    out = text.split_make_model(out, "marca")
    out = out.withColumnsRenamed({"br": "rodovia", "km": "posicao_rodovia"})
    out = out.withColumnsRenamed(TRACADO_RENAMES)
    # P3 (dag.py:198): consumed source columns exit the lineage here.
    return out.drop(
        "data_inversa", "horario", "latitude", "longitude", "tracado_via", "id"
    )


def union_years(dfs: list[DataFrame]) -> DataFrame:
    """U1 (dag.py:204-213)."""
    return relational.union_all(dfs)


def build_star(unioned: DataFrame) -> StarSchema:
    """dag.py:215-287: 5 dims (distinct + surrogate) + fact via broadcast joins.

    ``unioned`` should be persisted by the caller — it feeds 6 outputs.
    ``id_veiculo`` is kept in the fact although the reference DDL omits it
    (dag.py:372-381 vs 261) — documented deviation, FIXTURES.md.
    """
    dims = {
        "id_tempo": (star.build_dimension(unioned, DIM_TEMPO_KEY, "id_tempo"), DIM_TEMPO_KEY),
        "id_rodovia": (star.build_dimension(unioned, DIM_RODOVIA_KEY, "id_rodovia"), DIM_RODOVIA_KEY),
        "id_local": (star.build_dimension(unioned, DIM_LOCAL_KEY, "id_local"), DIM_LOCAL_KEY),
        "id_descritivo": (star.build_dimension(unioned, DIM_DESCRITIVO_KEY, "id_descritivo"), DIM_DESCRITIVO_KEY),
        "id_veiculo": (star.build_dimension(unioned, DIM_VEICULO_KEY, "id_veiculo"), DIM_VEICULO_KEY),
    }
    fact = star.attach_fks(unioned, dims)
    fact = fact.select(
        "id_descritivo", "id_tempo", "id_rodovia", "id_local", "id_veiculo",
        F.col("pessoas").cast("int").alias("pessoas_envolvidas"),
        F.col("veiculos").cast("int").alias("veiculos_envolvidos"),
        F.col("feridos").cast("int").alias("feridos"),
        F.col("mortos").cast("int").alias("obitos"),
    )
    fact = star.fact_grain_dedup(
        fact,
        ["id_descritivo", "id_tempo", "id_rodovia", "id_local"],
        order_by=["id_veiculo"],
    )
    return StarSchema(
        dim_tempo=dims["id_tempo"][0],
        dim_rodovia=dims["id_rodovia"][0],
        dim_local=dims["id_local"][0],
        dim_descritivo=dims["id_descritivo"][0],
        dim_veiculo=dims["id_veiculo"][0],
        fato_acidentes=fact,
    )


def run_pipeline(
    spark: SparkSession,
    year_files: dict[int, dict[str, str]],
    holidays_df: DataFrame | None = None,
) -> StarSchema:
    """End-to-end: raw CSVs → star schema, one lazy program + 3 scalar medians.

    ``year_files``: {year: {'ocorrencia': path, 'causas': path}} — the
    urls.json analogue (dag.py:449-466).
    """
    if holidays_df is None:
        holidays_df = holidays_br.holiday_dim(
            spark, sorted(year_files)
        )
    lanes = []
    for year in sorted(year_files):
        paths = year_files[year]
        ocorr = readers.read_raw_csv(spark, paths["ocorrencia"], schemas.OCORRENCIA_SCHEMA)
        causas = readers.read_raw_csv(spark, paths["causas"], schemas.CAUSAS_SCHEMA)
        lane = transform(clean(merge_year(ocorr, causas)), holidays_df)
        lanes.append(lane)
    unioned = union_years(lanes).persist()
    return build_star(unioned)
