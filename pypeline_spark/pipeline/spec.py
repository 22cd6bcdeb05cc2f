"""Pipeline spec: the reference's YAML config model, validated.

Reference structure (ref: /root/reference/pypeline/Pypeline.py:15-19,
38-48 and Pype.py:14-26): a YAML file with two top-level maps —
``pypelines`` (name -> ordered list of pype names) and ``pypes``
(name -> step config).  The reference merges config over defaults and
``setattr``s every key onto the step object, so required keys only
fail at use sites; and its pypeline-name validation has a typo
(``pype in self.config["pypes"][pype]`` at Pypeline.py:43) that turns
a missing pype into a KeyError.  Both are fixed here: the spec is a
validated dataclass and unknown/missing names raise with a clear
message at load time.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping, Optional, Sequence

VALID_TYPES = (
    "upsert", "update", "delete", "overwrite", "append", "cdc", "dedup",
    "lakehouse",
)
VALID_DEDUP_METHODS = ("exact", "minhash")
VALID_LAKEHOUSE_OPS = ("upsert", "update", "delete", "append", "overwrite")


class SpecError(ValueError):
    """Invalid pipeline configuration."""


@dataclass
class PypeSpec:
    """One step: extract -> transform chain -> keyed sink -> post hook.

    Mirrors the reference's per-pype config keys (ref: Pype.py:14-21):
    extract_query, target_table, type, transformers, identifier,
    post_query, bulk_size, fields_excluded_from_update, debug — with
    ``key_columns`` generalizing the reference's hard-coded ``id``
    conflict key (ref: Pype.py:117,127,134).
    """

    name: str
    extract_query: str
    target_table: str
    type: str = "upsert"
    transformers: Sequence[str] = field(default_factory=tuple)
    # Output schema when row transforms reshape rows: a DDL string
    # (applies to the final row run) or a list of DDL strings mapping
    # one-to-one onto row-transformer runs (mid-chain evolution,
    # matching the reference's per-batch header re-read, Pype.py:87).
    transformer_schema: Optional[object] = None
    identifier: Optional[str] = None  # delete-key column (ref: Pype.py:83,180)
    post_query: Optional[str] = None
    key_columns: Sequence[str] = ("id",)
    fields_excluded_from_update: Sequence[str] = field(default_factory=tuple)
    bulk_size: int = 2000  # kept for config parity; maps to scan partitioning hints
    debug: bool = False
    seq_column: str = "seq"  # cdc: ordering column of the change log
    op_column: str = "op"  # cdc: 'upsert' | 'delete' per log row
    dedup_method: str = "exact"  # dedup: 'exact' | 'minhash'
    text_column: str = "text"  # dedup: content column fingerprinted
    # lakehouse: which ManifestTable op the step dispatches to
    lakehouse_op: str = "upsert"
    # lakehouse: ledger batch-id template ({name} placeholders hydrate
    # with the run's placeholder map — same surface as extract_query)
    batch_id: Optional[str] = None
    # lakehouse update/delete: SQL predicate over the TARGET columns
    # (the UPDATE/DELETE .. WHERE forms, which consume no extract)
    where: Optional[str] = None
    # lakehouse update+where: column -> SQL expression assignments
    assignments: Optional[dict] = None
    # lakehouse + streaming extract (the extract_query selects from a
    # STREAMING temp view): Structured Streaming checkpoint location
    # for the foreachBatch micro-batch binding (r18 directive #2)
    checkpoint_dir: Optional[str] = None

    def __post_init__(self) -> None:
        lakehouse_predicate_op = (
            self.type == "lakehouse"
            and self.lakehouse_op in ("update", "delete")
            and self.where is not None
        )
        if not self.extract_query and not lakehouse_predicate_op:
            raise SpecError(f"pype {self.name!r}: extract_query is required")
        if not self.target_table:
            raise SpecError(f"pype {self.name!r}: target_table is required")
        if self.type not in VALID_TYPES:
            raise SpecError(
                f"pype {self.name!r}: type {self.type!r} not in {VALID_TYPES}"
            )
        if self.type == "delete" and not self.identifier:
            raise SpecError(f"pype {self.name!r}: delete requires identifier")
        if self.type in ("upsert", "update", "cdc") and not self.key_columns:
            raise SpecError(f"pype {self.name!r}: {self.type} requires key_columns")
        if self.type == "cdc" and not (self.seq_column and self.op_column):
            raise SpecError(f"pype {self.name!r}: cdc requires seq_column and op_column")
        if self.type == "dedup":
            if not self.key_columns:
                raise SpecError(f"pype {self.name!r}: dedup requires key_columns")
            if self.dedup_method not in VALID_DEDUP_METHODS:
                raise SpecError(
                    f"pype {self.name!r}: dedup_method {self.dedup_method!r} "
                    f"not in {VALID_DEDUP_METHODS}"
                )
            if not self.text_column:
                raise SpecError(f"pype {self.name!r}: dedup requires text_column")
        if self.type == "lakehouse":
            if self.lakehouse_op not in VALID_LAKEHOUSE_OPS:
                raise SpecError(
                    f"pype {self.name!r}: lakehouse_op "
                    f"{self.lakehouse_op!r} not in {VALID_LAKEHOUSE_OPS}"
                )
            if self.lakehouse_op == "upsert" and not self.key_columns:
                raise SpecError(
                    f"pype {self.name!r}: lakehouse upsert requires key_columns"
                )
            if self.lakehouse_op == "update":
                if self.where is not None and not self.assignments:
                    raise SpecError(
                        f"pype {self.name!r}: lakehouse update with "
                        "'where' requires 'assignments'"
                    )
                if self.assignments and self.where is None:
                    # the keyed-merge form takes its update payload
                    # from the extracted source columns — silently
                    # dropping the user's assignment expressions would
                    # be worse than rejecting them (ADVICE r18)
                    raise SpecError(
                        f"pype {self.name!r}: lakehouse update with "
                        "'assignments' requires 'where' (the keyed "
                        "form updates from the source columns; use "
                        "'where' + 'assignments' for expression "
                        "updates)"
                    )
                if self.where is None and not self.key_columns:
                    raise SpecError(
                        f"pype {self.name!r}: lakehouse update requires "
                        "key_columns (or 'where' + 'assignments')"
                    )
            if (
                self.lakehouse_op == "delete"
                and self.where is None
                and not self.identifier
            ):
                raise SpecError(
                    f"pype {self.name!r}: lakehouse delete requires "
                    "identifier (or 'where')"
                )
        elif (
            self.where is not None
            or self.assignments is not None
            or self.batch_id is not None
            or self.checkpoint_dir is not None
        ):
            raise SpecError(
                f"pype {self.name!r}: 'where'/'assignments'/'batch_id'/"
                "'checkpoint_dir' only apply to type 'lakehouse' "
                "(other sinks have no exactly-once ledger to key)"
            )


@dataclass
class PipelineConfig:
    """The whole config: named pipelines over a pool of named steps."""

    pypes: dict[str, PypeSpec]
    pypelines: dict[str, list[str]]

    @classmethod
    def from_dict(cls, raw: Mapping[str, Any]) -> "PipelineConfig":
        if "pypes" not in raw or "pypelines" not in raw:
            raise SpecError("config must contain 'pypes' and 'pypelines' maps")
        pypes: dict[str, PypeSpec] = {}
        for name, cfg in raw["pypes"].items():
            cfg = dict(cfg)
            cfg.pop("name", None)
            known = {f for f in PypeSpec.__dataclass_fields__}
            unknown = set(cfg) - known
            if unknown:
                raise SpecError(f"pype {name!r}: unknown config keys {sorted(unknown)}")
            pypes[name] = PypeSpec(name=name, **cfg)
        pypelines: dict[str, list[str]] = {}
        for pname, steps in raw["pypelines"].items():
            missing = [s for s in steps if s not in pypes]
            if missing:
                # The reference's check here is a typo'd no-op
                # (Pypeline.py:43) — we validate for real.
                raise SpecError(f"pypeline {pname!r}: unknown pypes {missing}")
            pypelines[pname] = list(steps)
        return cls(pypes=pypes, pypelines=pypelines)

    @classmethod
    def from_yaml(cls, path: str) -> "PipelineConfig":
        import yaml

        with open(path) as fh:
            # safe_load, not the reference's unsafe yaml.load
            # (ref: Pypeline.py:17).
            raw = yaml.safe_load(fh)
        return cls.from_dict(raw)

    def get_pypes(self, pipeline_name: str) -> list[PypeSpec]:
        """Ordered step specs for one pipeline (ref: Pypeline.py:37-50)."""
        if pipeline_name not in self.pypelines:
            raise SpecError(f"unknown pypeline {pipeline_name!r}")
        return [self.pypes[n] for n in self.pypelines[pipeline_name]]
