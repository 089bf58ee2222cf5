"""Explicit StructType schemas + value domains for the raw sources.

Schema-on-read with enforcement replaces the reference's inference +
try/except format checks (reference dag.py:47, 65-75); column set and
domains reconstructed in FIXTURES.md from every column reference in
dag.py / Análise.ipynb.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw CSV dialect (reference dag.py:47).  Spark's charset registry wants
# the canonical name 'iso-8859-1' (pandas' alias 'latin1' is rejected).
RAW_CSV_OPTIONS = {"sep": ";", "encoding": "iso-8859-1", "header": "true"}

OCORRENCIA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("data_inversa", T.StringType()),
        T.StructField("dia_semana", T.StringType()),
        T.StructField("horario", T.StringType()),
        T.StructField("uf", T.StringType()),
        T.StructField("br", T.DoubleType()),
        T.StructField("km", T.StringType()),
        T.StructField("municipio", T.StringType()),
        T.StructField("causa_acidente", T.StringType()),
        T.StructField("tipo_acidente", T.StringType()),
        T.StructField("classificacao_acidente", T.StringType()),
        T.StructField("fase_dia", T.StringType()),
        T.StructField("sentido_via", T.StringType()),
        T.StructField("condicao_metereologica", T.StringType()),
        T.StructField("tipo_pista", T.StringType()),
        T.StructField("tracado_via", T.StringType()),
        T.StructField("uso_solo", T.StringType()),
        T.StructField("pessoas", T.IntegerType()),
        T.StructField("mortos", T.IntegerType()),
        T.StructField("feridos_leves", T.IntegerType()),
        T.StructField("feridos_graves", T.IntegerType()),
        T.StructField("ilesos", T.IntegerType()),
        T.StructField("ignorados", T.IntegerType()),
        T.StructField("feridos", T.IntegerType()),
        T.StructField("veiculos", T.IntegerType()),
        T.StructField("latitude", T.StringType()),
        T.StructField("longitude", T.StringType()),
        T.StructField("regional", T.StringType()),
        T.StructField("delegacia", T.StringType()),
        T.StructField("uop", T.StringType()),
    ]
)

CAUSAS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("tipo_veiculo", T.StringType()),
        T.StructField("marca", T.StringType()),
        T.StructField("ano_fabricacao_veiculo", T.IntegerType()),
    ]
)

# Columns dropped right after the merge (reference dag.py:52, P2).
DROP_AFTER_MERGE = (
    "uop", "regional", "ignorados", "ilesos", "feridos_graves", "feridos_leves",
)

UF_LIST = (
    "AC", "AL", "AP", "AM", "BA", "CE", "DF", "ES", "GO", "MA", "MT", "MS",
    "MG", "PA", "PB", "PR", "PE", "PI", "RJ", "RN", "RS", "RO", "RR", "SC",
    "SP", "SE", "TO",
)

DIAS_SEMANA = (
    "domingo", "segunda-feira", "terça-feira", "quarta-feira",
    "quinta-feira", "sexta-feira", "sábado",
)

# Allow-lists for the 7 domain-validated columns (reference dag.py:92-99).
DOMAINS: dict[str, list[str]] = {
    "dia_semana": list(DIAS_SEMANA),
    "uf": list(UF_LIST),
    "sentido_via": ["Crescente", "Decrescente", "Não Informado"],
    "tipo_pista": ["Dupla", "Múltipla", "Simples"],
    "uso_solo": ["Não", "Sim"],
    "condicao_metereologica": [
        "Chuva", "Céu Claro", "Garoa/Chuvisco", "Granizo", "Ignorado",
        "Neve", "Nevoeiro/Neblina", "Nublado", "Sol", "Vento",
    ],
    "classificacao_acidente": [
        "Com Vítimas Fatais", "Com Vítimas Feridas", "Sem Vítimas",
    ],
}

# Text columns filled with 'não informado' when null (reference dag.py:88-90;
# every imputable non-marca string column).
TEXT_FILL_COLS = (
    "dia_semana", "uf", "municipio", "causa_acidente", "tipo_acidente",
    "classificacao_acidente", "sentido_via", "condicao_metereologica",
    "tipo_pista", "tracado_via", "uso_solo", "delegacia",
)
