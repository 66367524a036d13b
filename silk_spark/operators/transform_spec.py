"""TransformSpec executor: mapping rules -> one projection + quarantine.

Reference: TransformRule hierarchy (/root/reference/silk-rules/src/
main/scala/org/silkframework/rule/TransformRule.scala:33-431 —
DirectMapping :264-279, PatternUriMapping :289-326, TypeMapping
:328-341, ComplexMapping :354-374), executed per-entity with error
capture by TransformedEntities (silk-rules/.../execution/local/
TransformedEntities.scala:28-174) into a TransformReport.

Spark-first: ALL rules compile into ONE ``select`` projection
(whole-stage codegen); validation failures don't throw — the rule's
output goes NULL and an ``_errors`` array column records which rules
failed, so the quarantine split is a cheap filter and the report is a
single ``observe`` aggregate (no second pass, no Python)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class MappingRule:
    """One output column: a Column builder + optional validator.

    `validate` receives the built column and returns a boolean Column;
    rows failing it get NULL output + an error tag (the reference's
    abort-on-error mode is the caller filtering the quarantine)."""

    target: str
    build: Callable[[DataFrame], Column]
    validate: Callable[[Column], Column] | None = None


@dataclass
class ObjectRule:
    """Nested-object rule: child spec rendered as a struct column."""

    target: str
    child: "TransformSpec"


@dataclass
class TransformSpec:
    rules: list[MappingRule] = field(default_factory=list)
    uri_rule: MappingRule | None = None  # PatternUriMapping analogue

    def direct(self, target: str, source: str) -> "TransformSpec":
        """DirectMapping: 1 path -> 1 property."""
        self.rules.append(MappingRule(target, lambda df, s=source: F.col(s)))
        return self

    def complex(
        self,
        target: str,
        build: Callable[[DataFrame], Column],
        validate: Callable[[Column], Column] | None = None,
    ) -> "TransformSpec":
        self.rules.append(MappingRule(target, build, validate))
        return self

    def obj(self, target: str, child: "TransformSpec") -> "TransformSpec":
        """Nested ObjectMapping (TransformRule.scala:376-431): the
        child spec's rules become fields of ONE struct column (its uri
        rule becomes a `_uri` field), still inside the single parent
        projection. Nesting is recursive — a child spec may itself
        contain obj() rules (the reference nests ObjectMapping
        arbitrarily); validation failures at any depth tag the parent
        `_errors` with the dotted path 'target.child…field'."""
        self.rules.append(ObjectRule(target, child))
        return self

    def uri(self, pattern_cols: list[str], prefix: str = "urn:") -> "TransformSpec":
        """PatternUriMapping: deterministic subject URI from columns."""
        self.uri_rule = MappingRule(
            "_uri",
            lambda df: F.concat(
                F.lit(prefix), F.concat_ws("/", *[F.col(c).cast("string") for c in pattern_cols])
            ),
        )
        return self

    def execute(self, df: DataFrame) -> tuple[DataFrame, Observation]:
        """One projection for all rules; returns (frame, report).

        Output columns: [_uri?] + rule targets + `_errors`
        (array<string> of failed rule names, empty = clean row).
        The Observation aggregates row/error counts when an action
        runs — the TransformReport analogue, zero extra jobs."""
        cols, error_tags = self._compile(df, prefix="")
        if self.uri_rule is not None:
            cols.insert(0, self.uri_rule.build(df).alias(self.uri_rule.target))
        errors = F.array_compact(F.array(*error_tags)) if error_tags else F.array().cast(
            "array<string>"
        )
        out = df.select(*cols, errors.alias("_errors"))
        obs = Observation()
        out = out.observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.when(F.size("_errors") > 0, 1).otherwise(0)).alias("rows_with_errors"),
        )
        return out, obs

    def _compile(self, df: DataFrame, prefix: str) -> tuple[list[Column], list[Column]]:
        """Recursively lower this spec's rules into (columns, error
        tags). ObjectRules recurse: their child's columns fold into a
        struct (with the child's uri rule as a `_uri` field) and the
        child's error tags bubble up with dotted prefixes, so nested
        obj()-in-obj() compiles into nested struct literals inside the
        SAME single projection."""
        cols: list[Column] = []
        error_tags: list[Column] = []
        for rule in self.rules:
            if isinstance(rule, ObjectRule):
                child_prefix = f"{prefix}{rule.target}."
                fields, child_tags = rule.child._compile(df, prefix=child_prefix)
                if rule.child.uri_rule is not None:
                    fields.insert(0, rule.child.uri_rule.build(df).alias("_uri"))
                cols.append(F.struct(*fields).alias(rule.target))
                error_tags.extend(child_tags)
                continue
            raw = rule.build(df)
            if rule.validate is not None:
                ok = rule.validate(raw)
                cols.append(F.when(ok, raw).alias(rule.target))
                error_tags.append(
                    F.when(~F.coalesce(ok, F.lit(False)), F.lit(f"{prefix}{rule.target}"))
                )
            else:
                cols.append(raw.alias(rule.target))
        return cols, error_tags

    @staticmethod
    def clean(transformed: DataFrame) -> DataFrame:
        return transformed.filter(F.size("_errors") == 0).drop("_errors")

    @staticmethod
    def quarantine(transformed: DataFrame) -> DataFrame:
        """ErrorOutputWriter analogue: the failing rows with their
        per-rule error tags."""
        return transformed.filter(F.size("_errors") > 0)
