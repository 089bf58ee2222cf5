"""Synthetic mini-datatran fixture generator (FIXTURES.md).

The reference ships no test data; this builds deterministic per-year
(ocorrencia, causas) CSVs in the RAW dialect (sep=';', latin1 —
reference dag.py:47) with every dirty-data injection FIXTURES.md
requires, so the pipeline's cleaning operators are all exercised:

1.  nulls in every imputable column          7.  fase_dia inconsistent with horario
2.  out-of-domain categorical values         8.  decimal-comma lat/lon
3.  mortos>pessoas / feridos>pessoas rows    9.  duplicate causas ids
4.  pessoas=0 / veiculos=0 marker rows      10.  two distinct years
5.  dirty tracado_via labels                11.  holiday + weekend dates
6.  marca 'I/...' import form + null        12.  hour boundaries 5/7/12/18/23
"""

from __future__ import annotations

import csv
import os

FIXTURE_YEARS = (2022, 2023)

_OCORRENCIA_COLS = (
    "id", "data_inversa", "dia_semana", "horario", "uf", "br", "km",
    "municipio", "causa_acidente", "tipo_acidente", "classificacao_acidente",
    "fase_dia", "sentido_via", "condicao_metereologica", "tipo_pista",
    "tracado_via", "uso_solo", "pessoas", "mortos", "feridos_leves",
    "feridos_graves", "ilesos", "ignorados", "feridos", "veiculos",
    "latitude", "longitude", "regional", "delegacia", "uop",
)
_CAUSAS_COLS = ("id", "tipo_veiculo", "marca", "ano_fabricacao_veiculo")

# (horario, expected fase_dia) — boundaries 5/7/12/18/23 (dag.py:106-113).
_HOURS = (
    ("04:59:00", "Madrugada"), ("05:00:00", "Amanhecer"), ("06:59:59", "Amanhecer"),
    ("07:00:00", "Dia"), ("11:59:00", "Dia"), ("12:00:00", "Tarde"),
    ("17:59:00", "Tarde"), ("18:00:00", "Noite"), ("23:00:00", "Noite"),
)

_TRACADOS = (
    "Reta", "Curva", "Reta;Aclive", "Reta;Curva;Ponte", "Acli",
    "Aclive    ", "Túnel;Desvio Temporário", "Rotatória",
)

_MARCAS = (
    "VW/GOL 1.0", "FIAT/UNO MILLE", "I/TOYOTA COROLLA XEI", "GM/CELTA",
    None, "I/HONDA CIVIC LX", "FORD/KA",
)

_WEEKDAYS_BY_DOW = {
    0: "segunda-feira", 1: "terça-feira", 2: "quarta-feira", 3: "quinta-feira",
    4: "sexta-feira", 5: "sábado", 6: "domingo",
}


def _ocorrencia_rows(year: int, n_rows: int = 36) -> list[dict]:
    import datetime as dt

    rows = []
    # Deterministic spread of dates incl. Jan 1 (holiday), a Saturday,
    # and mid-week days.  ``n_rows`` scales the fixture for throughput
    # checks; dirty injections stay at the same fixed indices.
    base_dates = [
        dt.date(year, 1, 1),   # holiday
        dt.date(year, 3, 5),
        dt.date(year, 5, 14),
        dt.date(year, 7, 2),
        dt.date(year, 9, 7),   # holiday (Independência)
        dt.date(year, 11, 20),
    ]
    ufs = ["SC", "SP", "MG", "RS", "BA", "XX"]  # XX = out-of-domain
    condicoes = ["Céu Claro", "Chuva", "Chuvisco", "Nublado", "Sol", None]
    for i in range(n_rows):
        d = base_dates[i % 6]
        horario, _ = _HOURS[i % len(_HOURS)]
        pessoas, mortos, feridos, veiculos = 3, 0, 1, 2
        if i == 7:
            mortos = 5          # violates mortos<=pessoas → filtered
        if i == 19:
            mortos = 1          # valid fatality row (survives the filter)
        if i == 11:
            feridos = 9         # violates feridos<=pessoas → filtered
        if i == 13:
            pessoas = 0         # zero marker → median-imputed
        if i == 17:
            veiculos = 0        # zero marker → median-imputed
        rows.append(
            {
                "id": year * 100000 + i,
                "data_inversa": d.isoformat(),
                "dia_semana": "Segunda" if i == 5 else _WEEKDAYS_BY_DOW[d.weekday()],
                "horario": horario,
                "uf": ufs[i % 6],
                "br": None if i % 9 == 0 else float(101 + (i % 4) * 50),
                "km": None if i % 9 == 0 else f"{100 + i},5",
                "municipio": f"MUNICIPIO {i % 5}",
                "causa_acidente": f"Causa {i % 4}",
                "tipo_acidente": f"Tipo {i % 3}",
                "classificacao_acidente": (
                    "Sem Vítimas" if i % 3 == 0 else "Com Vítimas Feridas"
                ),
                "fase_dia": "Pleno dia",  # inconsistent on purpose; recomputed
                "sentido_via": "Crescente" if i % 2 == 0 else "Decrescente",
                "condicao_metereologica": condicoes[i % 6],
                "tipo_pista": ("Dupla", "Simples", "Múltipla")[i % 3],
                "tracado_via": _TRACADOS[i % len(_TRACADOS)],
                "uso_solo": "Sim" if i % 2 == 0 else "Não",
                "pessoas": pessoas,
                "mortos": mortos,
                "feridos_leves": 0,
                "feridos_graves": 0,
                "ilesos": 1,
                "ignorados": 0,
                "feridos": feridos,
                "veiculos": veiculos,
                "latitude": f"-27,{5000 + i}",
                "longitude": f"-48,{5400 + i}",
                "regional": "SPRF-SC",
                "delegacia": None if i % 8 == 0 else f"DEL0{i % 4}-SC",
                "uop": "UOP01",
            }
        )
    return rows


def _causas_rows(year: int, n_rows: int = 36) -> list[dict]:
    rows = []
    for i in range(n_rows):
        acc_id = year * 100000 + i
        # duplicate ids: two vehicle rows for every 4th accident (→ D1 dedup)
        n = 2 if i % 4 == 0 else 1
        for j in range(n):
            rows.append(
                {
                    "id": acc_id,
                    "tipo_veiculo": ("Automóvel", "Motocicleta", None)[(i + j) % 3],
                    "marca": _MARCAS[(i + j) % len(_MARCAS)],
                    "ano_fabricacao_veiculo": (
                        None if i % 5 == 0 else (0 if i % 7 == 0 else 2000 + i % 20)
                    ),
                }
            )
    return rows


def _write_csv(path: str, cols: tuple[str, ...], rows: list[dict]) -> None:
    """RAW dialect: ';' separator, latin1, empty string for nulls (dag.py:47)."""
    with open(path, "w", encoding="latin1", newline="") as f:
        w = csv.writer(f, delimiter=";")
        w.writerow(cols)
        for r in rows:
            w.writerow(["" if r[c] is None else r[c] for c in cols])


def write_fixture(
    dest_dir: str,
    years: tuple[int, ...] = FIXTURE_YEARS,
    n_rows: int = 36,
) -> dict[int, dict[str, str]]:
    """Write per-year raw CSVs; returns {year: {'ocorrencia': path, 'causas': path}}."""
    os.makedirs(dest_dir, exist_ok=True)
    out: dict[int, dict[str, str]] = {}
    for year in years:
        opath = os.path.join(dest_dir, f"datatran{year}.csv")
        cpath = os.path.join(dest_dir, f"causas{year}.csv")
        _write_csv(opath, _OCORRENCIA_COLS, _ocorrencia_rows(year, n_rows))
        _write_csv(cpath, _CAUSAS_COLS, _causas_rows(year, n_rows))
        out[year] = {"ocorrencia": opath, "causas": cpath}
    return out
