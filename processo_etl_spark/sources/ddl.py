"""S8 — explicit relational DDL for the warehouse star schema.

The reference creates its 6-table star with hand-written CREATE TABLEs —
SERIAL surrogate PKs on the five dimensions, a composite PK over the four
FK columns on the fact, and one FOREIGN KEY per dimension (reference
dag.py:304-387).  ``write.jdbc`` only ever creates bare untyped tables,
so this module derives the full constraint-bearing DDL from Spark
schemas: the engine stays the source of truth for column types and the
sink gets real PK/FK metadata (informational for the optimizer, enforced
on engines that enforce).

Emission order is dependency-sorted (dimensions before facts) and the
DROP order is the reverse, matching the reference's FK-safe teardown
(dag.py:304-311).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


@dataclass
class ForeignKey:
    column: str
    ref_table: str
    ref_column: str


@dataclass
class TableSpec:
    """One sink table: Spark schema + relational constraints."""

    name: str
    schema: T.StructType
    primary_key: list[str] = field(default_factory=list)
    foreign_keys: list[ForeignKey] = field(default_factory=list)
    serial_pk: bool = False  # single-column PK becomes SERIAL/IDENTITY


_SQL_TYPES: dict[type, str] = {
    T.LongType: "BIGINT",
    T.IntegerType: "INT",
    T.ShortType: "SMALLINT",
    T.DoubleType: "DOUBLE PRECISION",
    T.FloatType: "REAL",
    T.BooleanType: "BOOLEAN",
    T.DateType: "DATE",
    T.TimestampType: "TIMESTAMP",
    T.TimestampNTZType: "TIMESTAMP",
    T.BinaryType: "BYTEA",
}


def sql_type(dt: T.DataType, dialect: str = "postgresql") -> str:
    """Spark type → ANSI-ish column type (Postgres spelling by default)."""
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "VARCHAR" if dialect == "postgresql" else "VARCHAR(4000)"
    for spark_t, name in _SQL_TYPES.items():
        if isinstance(dt, spark_t):
            if name == "BYTEA" and dialect != "postgresql":
                return "BLOB"
            return name
    raise TypeError(f"no SQL mapping for Spark type {dt.simpleString()}")


def create_table_ddl(spec: TableSpec, dialect: str = "postgresql") -> str:
    """CREATE TABLE with column types, PK (SERIAL/composite) and FKs."""
    lines = []
    for f in spec.schema.fields:
        if (
            spec.serial_pk
            and spec.primary_key == [f.name]
            and dialect == "postgresql"
        ):
            lines.append(f"  {f.name} SERIAL PRIMARY KEY")
            continue
        null = "" if f.nullable else " NOT NULL"
        lines.append(f"  {f.name} {sql_type(f.dataType, dialect)}{null}")
    if spec.primary_key and not (spec.serial_pk and dialect == "postgresql"):
        lines.append(f"  PRIMARY KEY ({', '.join(spec.primary_key)})")
    for fk in spec.foreign_keys:
        lines.append(
            f"  FOREIGN KEY ({fk.column}) "
            f"REFERENCES {fk.ref_table}({fk.ref_column})"
        )
    body = ",\n".join(lines)
    return f"CREATE TABLE {spec.name} (\n{body}\n)"


def _dependency_order(specs: list[TableSpec]) -> list[TableSpec]:
    """Parents before children (FK targets first); stable for ties."""
    by_name = {s.name: s for s in specs}
    seen: set[str] = set()
    out: list[TableSpec] = []

    def visit(s: TableSpec, stack: tuple[str, ...]) -> None:
        if s.name in seen:
            return
        if s.name in stack:
            raise ValueError(f"FK cycle involving {s.name}")
        for fk in s.foreign_keys:
            ref = by_name.get(fk.ref_table)
            if ref is not None:
                visit(ref, (*stack, s.name))
        seen.add(s.name)
        out.append(s)

    for s in specs:
        visit(s, ())
    return out


def star_ddl(specs: list[TableSpec], dialect: str = "postgresql") -> list[str]:
    """CREATE statements in FK-safe order (dims → fact)."""
    return [create_table_ddl(s, dialect) for s in _dependency_order(specs)]


def drop_ddl(specs: list[TableSpec], if_exists: bool = True) -> list[str]:
    """DROP statements in reverse dependency order (fact → dims)."""
    guard = "IF EXISTS " if if_exists else ""
    return [f"DROP TABLE {guard}{s.name}" for s in reversed(_dependency_order(specs))]


def star_schema_specs(
    dims: dict[str, T.StructType], fact_name: str, fact_schema: T.StructType,
    fact_extra_pk: list[str] | None = None,
) -> list[TableSpec]:
    """Reference-shaped star: each dim gets a SERIAL PK named ``id_<dim>``
    (already present as a column in its schema); the fact's PK is the
    composite of all dim FK columns (dag.py:372-386) plus any
    caller-supplied grain columns."""
    specs = []
    fk_cols = []
    for dim_name, schema in dims.items():
        id_col = f"id_{dim_name}"
        if id_col not in schema.names:
            raise ValueError(f"dimension {dim_name} lacks its {id_col} column")
        specs.append(
            TableSpec(
                name=f"dim_{dim_name}",
                schema=schema,
                primary_key=[id_col],
                serial_pk=True,
            )
        )
        fk_cols.append((id_col, f"dim_{dim_name}"))
    fact_pk = [c for c, _ in fk_cols] + list(fact_extra_pk or [])
    specs.append(
        TableSpec(
            name=fact_name,
            schema=fact_schema,
            primary_key=fact_pk,
            foreign_keys=[
                ForeignKey(c, ref_table, c) for c, ref_table in fk_cols
            ],
        )
    )
    return specs
