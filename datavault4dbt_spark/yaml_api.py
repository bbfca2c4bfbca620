"""yaml_metadata front-end — the reference package's primary config
surface, accepted verbatim.

Every table macro in the reference takes a ``yaml_metadata`` string
(reference: macros/internal/metadata_processing/yaml_metadata_parser.sql:1-29;
per-macro key documentation in each dispatcher, e.g.
macros/staging/stage.sql:8-122, macros/tables/hub.sql:13-105). This
module parses those exact YAML shapes into this engine's config
dataclasses, so a datavault4dbt user can carry their metadata blocks
over unchanged:

    cfg = parse_stage('''
      source_model: source_account
      ldts: edwLoadDate
      rsrc: '!SAP.Accounts'
      hashed_columns:
        hk_account_h: [account_number]
        hd_account_s:
          is_hashdiff: true
          columns: [name, address]
    ''', name="stage_account")
    df = build_stage(spark, registry, cfg)

Source-column schemas are introspected from the registry DataFrame at
plan-build time (as dbt does via get_columns_in_relation), so the YAML
needs nothing the reference's YAML does not have.
"""

from __future__ import annotations

import yaml

from .functions.hashing import HashSpec
from .operators.stage import (StageConfig, DerivedColumn, Prejoin,
                              MultiActiveConfig)
from .operators.hub import HubConfig, EntitySource
from .operators.link import LinkConfig
from .operators.sat import SatConfig, SatV1Config
from .operators.nh import NhSatConfig, NhLinkConfig
from .operators.ma_sat import MaSatConfig, MaSatV1Config
from .operators.rec_track import RecTrackConfig
from .operators.eff_sat import EffSatConfig
from .operators.pit import PitConfig
from .operators.ref_entities import (RefHubConfig, RefSatConfig,
                                     RefSatV1Config, RefTableConfig)
from .operators.snapshots import SnapV0Config, SnapV1Config, LogLogic


def _load(yaml_metadata) -> dict:
    if isinstance(yaml_metadata, dict):
        return dict(yaml_metadata)
    return yaml.safe_load(yaml_metadata) or {}


def _hashed_columns(d: dict) -> tuple:
    """Reference shape (stage.sql:44-54): hashkey -> [cols];
    hashdiff -> {is_hashdiff: true, columns: [...]}."""
    out = []
    for name, spec in (d or {}).items():
        if isinstance(spec, dict):
            out.append(HashSpec(name, tuple(spec["columns"]),
                                is_hashdiff=bool(spec.get("is_hashdiff"))))
        else:
            cols = (spec,) if isinstance(spec, str) else tuple(spec)
            out.append(HashSpec(name, cols))
    return tuple(out)


def _derived_columns(d: dict) -> tuple:
    """Reference shape (stage.sql:56-68): name -> {value, datatype} or
    name -> value."""
    out = []
    for name, spec in (d or {}).items():
        if isinstance(spec, dict):
            out.append(DerivedColumn(name, str(spec["value"]),
                                     str(spec.get("datatype", "STRING"))))
        else:
            out.append(DerivedColumn(name, str(spec)))
    return tuple(out)


def _prejoined_columns(d: dict) -> tuple:
    """Reference shapes (stage.sql:78-122): old syntax
    alias -> {src_table, bk, this_column_name, ref_column_name} and new
    syntax ref_model -> {ref_model/src_table, bk/extract_columns,
    this_column_name, ref_column_name} (lists allowed)."""
    joins: dict = {}
    for alias, spec in (d or {}).items():
        ref = spec.get("ref_model") or spec.get("src_table")
        this = spec["this_column_name"]
        that = spec["ref_column_name"]
        on = tuple(zip((this,) if isinstance(this, str) else tuple(this),
                       (that,) if isinstance(that, str) else tuple(that)))
        extracts = spec.get("extract_columns")
        if extracts:  # new syntax: alias key IS the ref model
            ref = ref or alias
            ext = tuple((e, e, "STRING") for e in extracts)
        else:
            ext = ((alias, spec["bk"], spec.get("datatype", "STRING")),)
        key = (ref, on)
        joins.setdefault(key, []).extend(ext)
    return tuple(Prejoin(ref, on, tuple(ext))
                 for (ref, on), ext in joins.items())


def parse_stage(yaml_metadata, name: str) -> StageConfig:
    m = _load(yaml_metadata)
    src = m["source_model"]
    if isinstance(src, dict):  # {'source_name': 'table'} -> table name
        src = next(iter(src.values()))
    ma = None
    if m.get("multi_active_config"):
        mac = m["multi_active_config"]
        keys = mac["multi_active_key"]
        ma = MultiActiveConfig(
            (keys,) if isinstance(keys, str) else tuple(keys),
            mac["main_hashkey_column"])
    return StageConfig(
        name=name, source_model=src,
        ldts=str(m.get("ldts", "current_timestamp()")),
        rsrc=str(m.get("rsrc", "!UNKNOWN")),
        source_schema=(tuple(tuple(p) for p in m["source_schema"])
                       if m.get("source_schema") else None),
        hashed_columns=_hashed_columns(m.get("hashed_columns")),
        derived_columns=_derived_columns(m.get("derived_columns")),
        prejoined_columns=_prejoined_columns(m.get("prejoined_columns")),
        missing_columns=tuple((c, t) for c, t in
                              (m.get("missing_columns") or {}).items()),
        multi_active=ma,
        enable_ghost_records=bool(m.get("enable_ghost_records", True)),
        include_source_columns=bool(m.get("include_source_columns", True)),
        sequence=m.get("sequence"),
        sequence_dtype=str(m.get("sequence_dtype", "BIGINT")))


def _sources(m, bk_key: str = "business_keys") -> tuple:
    """Reference source_models shapes (hub.sql:26-60): string, list of
    strings, or list of dicts with name/hk_column/bk_columns/rsrc_static."""
    sm = m["source_models"]
    if isinstance(sm, (str, dict)):
        sm = [sm]
    out = []
    for s in sm:
        if isinstance(s, str):
            out.append(EntitySource(s))
        else:
            bks = s.get("bk_columns")
            fks = s.get("fk_columns") or s.get("link_hashkeys")
            pay = s.get("payload")
            out.append(EntitySource(
                s["name"],
                hk_column=s.get("hk_column"),
                bk_columns=(tuple(bks) if bks else None),
                rsrc_static=s.get("rsrc_static"),
                fk_columns=(tuple(fks) if fks else None),
                payload=(tuple(pay) if pay else None)))
    return tuple(out)


def _tuple(v) -> tuple:
    if v is None:
        return ()
    return (v,) if isinstance(v, str) else tuple(v)


def parse_hub(yaml_metadata, name: str) -> HubConfig:
    m = _load(yaml_metadata)
    return HubConfig(name, m["hashkey"], _tuple(m["business_keys"]),
                     _sources(m), _tuple(m.get("additional_columns")))


def parse_link(yaml_metadata, name: str) -> LinkConfig:
    m = _load(yaml_metadata)
    return LinkConfig(name, m["link_hashkey"], _tuple(m["foreign_hashkeys"]),
                      _sources(m))


def parse_sat_v0(yaml_metadata, name: str) -> SatConfig:
    m = _load(yaml_metadata)
    return SatConfig(name, m["source_model"], m["parent_hashkey"],
                     m["src_hashdiff"],
                     hashdiff_alias=m.get("hashdiff_alias"),
                     payload=_tuple(m.get("src_payload")),
                     source_is_single_batch=bool(
                         m.get("source_is_single_batch", False)))


def parse_sat_v1(yaml_metadata, name: str) -> SatV1Config:
    m = _load(yaml_metadata)
    return SatV1Config(name, m["sat_v0"], m["parent_hashkey"],
                       m["src_hashdiff"],
                       include_payload=_tuple(m.get("include_payload")
                                              or m.get("src_payload")),
                       add_is_current_flag=bool(
                           m.get("add_is_current_flag", False)))


def parse_nh_sat(yaml_metadata, name: str) -> NhSatConfig:
    m = _load(yaml_metadata)
    return NhSatConfig(name, m["source_model"], m["parent_hashkey"],
                       _tuple(m.get("src_payload")),
                       source_is_single_batch=bool(
                           m.get("source_is_single_batch", True)))


def parse_nh_link(yaml_metadata, name: str) -> NhLinkConfig:
    m = _load(yaml_metadata)
    return NhLinkConfig(name, m["link_hashkey"], _tuple(m["foreign_hashkeys"]),
                        _tuple(m.get("payload")), _sources(m),
                        union_strategy=m.get("union_strategy", "all"),
                        source_is_single_batch=bool(
                            m.get("source_is_single_batch", True)))


def parse_ma_sat_v0(yaml_metadata, name: str) -> MaSatConfig:
    m = _load(yaml_metadata)
    return MaSatConfig(name, m["source_model"], m["parent_hashkey"],
                       m["src_hashdiff"], _tuple(m["src_ma_key"]),
                       payload=_tuple(m.get("src_payload")))


def parse_rec_track_sat(yaml_metadata, name: str) -> RecTrackConfig:
    m = _load(yaml_metadata)
    return RecTrackConfig(name, m["tracked_hashkey"], _sources(m))


def parse_eff_sat_v0(yaml_metadata, name: str) -> EffSatConfig:
    m = _load(yaml_metadata)
    return EffSatConfig(name, m["source_model"], m["tracked_hashkey"],
                        source_is_single_batch=bool(
                            m.get("source_is_single_batch", False)))


def parse_pit(yaml_metadata, name: str) -> PitConfig:
    m = _load(yaml_metadata)
    return PitConfig(name, m["tracked_entity"], m["hashkey"],
                     _tuple(m["sat_names"]), m["snapshot_relation"],
                     m.get("dimension_key", "dimension_key"),
                     snapshot_trigger_column=m.get("snapshot_trigger_column"),
                     refer_to_ghost_records=bool(
                         m.get("refer_to_ghost_records", True)),
                     custom_rsrc=m.get("custom_rsrc"),
                     pit_type=m.get("pit_type"))


def parse_bridge(yaml_metadata, name: str) -> "BridgeConfig":
    """Beyond-reference (operators/bridge.py): legs are mappings with
    link_entity/link_hk/from_hk/to_hk and optional eff_sat /
    eff_active_col, in traversal order."""
    from .operators.bridge import BridgeConfig, BridgeLeg
    m = _load(yaml_metadata)
    legs = tuple(
        BridgeLeg(leg["link_entity"], leg["link_hk"], leg["from_hk"],
                  leg["to_hk"], eff_sat=leg.get("eff_sat", ""),
                  eff_active_col=leg.get("eff_active_col", "is_active"))
        for leg in m["legs"])
    return BridgeConfig(name, m["base_entity"], m["base_hk"],
                        m["snapshot_relation"], legs,
                        bridge_key=m.get("bridge_key", "bridge_key"),
                        snapshot_trigger_column=m.get(
                            "snapshot_trigger_column"))


def parse_vault_checks(yaml_metadata, name: str) -> "VaultChecksConfig":
    """Beyond-reference (operators/checks.py): the reference doc's
    soft-constraint test table as declarative YAML — each check is a
    mapping with entity/kind/columns and, for relationship,
    to_entity [+ to_columns]."""
    from .operators.checks import Check, VaultChecksConfig
    m = _load(yaml_metadata)
    checks = tuple(
        Check(c["entity"], c["kind"], _tuple(c["columns"]),
              to_entity=c.get("to_entity", ""),
              to_columns=_tuple(c.get("to_columns") or ()))
        for c in m["checks"])
    return VaultChecksConfig(name, checks)


def parse_ma_sat_v1(yaml_metadata, name: str) -> MaSatV1Config:
    """reference: macros/tables/ma_sat_v1.sql:13 (sat_v0, hashkey,
    hashdiff, ma_attribute, add_is_current_flag)."""
    m = _load(yaml_metadata)
    return MaSatV1Config(name, m["sat_v0"], m["hashkey"], m["hashdiff"],
                         _tuple(m.get("ma_attribute") or m.get("src_ma_key")),
                         payload=_tuple(m.get("src_payload")),
                         add_is_current_flag=bool(
                             m.get("add_is_current_flag", False)))


def parse_ref_hub(yaml_metadata, name: str) -> RefHubConfig:
    """reference: macros/tables/ref_hub.sql:1 (ref_keys, source_models,
    additional_columns)."""
    m = _load(yaml_metadata)
    return RefHubConfig(name, _tuple(m["ref_keys"]), _sources(m),
                        _tuple(m.get("additional_columns")))


def parse_ref_sat_v0(yaml_metadata, name: str) -> RefSatConfig:
    """reference: macros/tables/ref_sat_v0.sql:1 (parent_ref_keys,
    src_hashdiff, src_payload, source_model, source_is_single_batch)."""
    m = _load(yaml_metadata)
    return RefSatConfig(name, m["source_model"],
                        _tuple(m["parent_ref_keys"]), m["src_hashdiff"],
                        payload=_tuple(m.get("src_payload")),
                        source_is_single_batch=bool(
                            m.get("source_is_single_batch", False)))


def parse_ref_sat_v1(yaml_metadata, name: str) -> RefSatV1Config:
    """reference: macros/tables/ref_sat_v1.sql:1 (ref_sat_v0, ref_keys,
    hashdiff, add_is_current_flag)."""
    m = _load(yaml_metadata)
    return RefSatV1Config(name, m["ref_sat_v0"], _tuple(m["ref_keys"]),
                          m["hashdiff"],
                          payload=_tuple(m.get("src_payload")
                                         or m.get("payload")),
                          add_is_current_flag=bool(
                              m.get("add_is_current_flag", False)))


def parse_ref_table(yaml_metadata, name: str) -> RefTableConfig:
    """reference: macros/tables/ref_table.sql:1 (ref_hub,
    ref_satellites — string | list | {sat: {include: [...]}} —
    historized, snapshot_relation)."""
    m = _load(yaml_metadata)
    sats = m["ref_satellites"]
    if isinstance(sats, str):
        sats = [sats]
    parsed = []
    if isinstance(sats, dict):
        for sat, spec in sats.items():
            inc = tuple((spec or {}).get("include") or ())
            parsed.append((sat, inc))
    else:
        for s in sats:
            if isinstance(s, dict):  # [{sat: {include: [...]}}]
                ((sat, spec),) = s.items()
                parsed.append((sat, tuple((spec or {}).get("include") or ())))
            else:
                parsed.append((s, ()))
    return RefTableConfig(name, m["ref_hub"], _tuple(m["ref_keys"]),
                          tuple(parsed),
                          historized=m.get("historized", "latest"),
                          snapshot_relation=m.get("snapshot_relation"))


def parse_control_snap_v0(yaml_metadata, name: str) -> SnapV0Config:
    """reference: macros/tables/control_snap_v0.sql:51 (start_date,
    daily_snapshot_time, end_date)."""
    m = _load(yaml_metadata)
    return SnapV0Config(name, str(m["start_date"]),
                        str(m.get("daily_snapshot_time", "00:00:00")),
                        end_date=(str(m["end_date"])
                                  if m.get("end_date") else None))


def _log_logic(spec: dict | None, trigger_col: str) -> dict | None:
    """reference log_logic YAML (control_snap_v1.sql:55-68):
    {daily: {duration: 3, unit: MONTH}, yearly: {forever: TRUE}} —
    one implicit trigger column; a nested {col: {...}} form selects
    explicit trigger columns."""
    if spec is None:
        return None
    units = {"daily", "weekly", "monthly", "yearly"}

    def one(d: dict) -> LogLogic:
        kw = {}
        for unit, rule in d.items():
            if str(rule.get("forever", "")).upper() in ("TRUE", "1"):
                kw[unit] = ("forever",)
            else:
                kw[unit] = (str(rule["duration"]), str(rule["unit"]))
        return LogLogic(**kw)

    if set(spec) <= units:
        return {trigger_col: one(spec)}
    return {col: one(d) for col, d in spec.items()}


def parse_control_snap_v1(yaml_metadata, name: str,
                          trigger_col: str = "is_active") -> SnapV1Config:
    """reference: macros/tables/control_snap_v1.sql:31
    (control_snap_v0, log_logic)."""
    m = _load(yaml_metadata)
    return SnapV1Config(name, m["control_snap_v0"],
                        log_logic=_log_logic(m.get("log_logic"), trigger_col),
                        current_ts=m.get("current_ts"))


def _dataclass_parser(cls):
    """Generic YAML parser for the flat LLM-operator configs: every
    YAML key must be a dataclass field; YAML lists become tuples
    (recursively) to satisfy frozen-dataclass hashing. Unknown keys
    fail loudly — a typo'd knob must not silently keep its default."""
    import dataclasses

    field_names = {f.name for f in dataclasses.fields(cls)} - {"name"}

    def _to_tuple(v):
        if isinstance(v, list):
            return tuple(_to_tuple(x) for x in v)
        return v

    def parse_fn(yaml_metadata, name: str):
        m = _load(yaml_metadata)
        unknown = set(m) - field_names
        if unknown:
            raise ValueError(
                f"{cls.__name__}: unknown yaml keys {sorted(unknown)} "
                f"(expected a subset of {sorted(field_names)})")
        return cls(name=name, **{k: _to_tuple(v) for k, v in m.items()})

    return parse_fn


def _asof_config():
    from .operators.asof import AsofJoinConfig
    return AsofJoinConfig


def _events_configs():
    from .operators.events import SessionizeConfig, HoppingAggConfig
    return SessionizeConfig, HoppingAggConfig


def _interval_config():
    from .operators.rangejoin import IntervalJoinConfig
    return IntervalJoinConfig


def _funnel_config():
    from .operators.events import FunnelConfig
    return FunnelConfig


def _cohort_config():
    from .operators.events import CohortRetentionConfig
    return CohortRetentionConfig


def _diff_config():
    from .operators.diff import TableDiffConfig
    return TableDiffConfig


def _llm_parsers() -> dict:
    """kind -> parser for the beyond-reference training-data operators,
    so a project YAML can declare the full curation pipeline alongside
    the vault entities (plans/project.py wires the builders)."""
    from .llm.dedup import (ExactDedupConfig, MinHashLshConfig,
                            SimHashConfig, NgramJaccardConfig,
                            EmbeddingCosineConfig, DupGroupsConfig)
    from .llm.similarity import AnnConfig, IvfConfig
    from .llm.textstats import (LangIdConfig, QualityConfig,
                                TokenCountConfig, FingerprintConfig)
    from .llm.multimodal import MultimodalConfig
    from .llm.curation import CurationConfig, DedupReportConfig
    from .llm.contamination import ContaminationConfig
    from .llm.scrub import RepetitionConfig, PiiRedactConfig
    from .llm.sampling import (DatasetMixConfig, SequencePackingConfig,
                               PackingManifestConfig, CorpusShuffleConfig,
                               TemperatureMixConfig,
                               ProportionalSampleConfig)
    from .llm.semdedup import SemDedupConfig
    from .llm.quantize import ScalarQuantizeConfig
    from .llm.substring import SubstringDupConfig
    from .llm.tfidf import TfidfConfig
    from .llm.sources import (SourceStatsConfig, SourceGateConfig,
                              TokenBudgetConfig)
    from .llm.chunking import (ChunkConfig, ChunkDedupConfig,
                               ChunkScrubConfig)
    from .llm.lm import BigramLmConfig, CcnetBucketsConfig
    from .llm.vocab import VocabTopkConfig
    from .llm.gopher import GopherRulesConfig
    from .llm.boilerplate import BoilerplateConfig
    from .llm.dsir import DsirConfig
    from .llm.multimodal import MultimodalDecodeConfig
    from .llm.profile import ProfileConfig, GroupedQuantilesConfig
    from .llm.lineclean import LineCleanConfig
    from .llm.selection import (CanonicalConfig, StratifiedSplitConfig,
                                SourceCapConfig, KFoldConfig)
    from .llm.incdedup import IncrementalDedupConfig
    from .llm.profile import (HeavyHittersConfig, HistogramConfig,
                              SufficientStatsConfig)
    from .llm.vocab import GroupedVocabConfig
    from .llm.sampling import ExactSampleConfig
    from .llm.selection import QuantileGateConfig
    from .operators.rollup import GroupingSetsConfig
    from .operators.merge import Scd1MergeConfig
    from .operators.jsonx import JsonExtractConfig
    from .operators.pivot import PivotConfig
    from .operators.quarantine import QuarantineConfig
    from .operators.events import (TransitionMatrixConfig, LocfConfig,
                                   RollingAggConfig, OhlcBarsConfig,
                                   AttributionConfig,
                                   ConversionPathConfig,
                                   ActiveUsersConfig)
    from .operators.linkage import BlockedLinkageConfig
    from .llm.overlap import SourceOverlapConfig
    from .operators.basket import CooccurrenceConfig
    from .llm.privacy import KAnonymityConfig
    from .sources.readers import PartitionedRoundtripConfig
    from .operators.compaction import CompactionConfig
    from .llm.selection import PercentileRankConfig
    from .llm.profile import TrendingConfig
    from .llm.lineclean import TextNormalizeConfig
    from .llm.annindex import AnnIndexConfig
    from .llm.urlcuration import UrlGateConfig
    from .llm.outliers import TukeyOutlierConfig
    from .llm.negatives import NegativeSamplesConfig
    from .llm.profile import ProfileDriftConfig
    from .llm.multimodal import (MultimodalFrameSampleConfig,
                                 MultimodalResizeConfig,
                                 WavDecodeConfig, WavStatsConfig,
                                 UlawStatsConfig, PngDecodeConfig,
                                 GifFramesConfig)

    return {
        "exact_dedup": _dataclass_parser(ExactDedupConfig),
        "minhash_lsh": _dataclass_parser(MinHashLshConfig),
        "simhash_dedup": _dataclass_parser(SimHashConfig),
        "ngram_jaccard": _dataclass_parser(NgramJaccardConfig),
        "embedding_cosine": _dataclass_parser(EmbeddingCosineConfig),
        "dup_groups": _dataclass_parser(DupGroupsConfig),
        "ann_topk": _dataclass_parser(AnnConfig),
        "ann_ivf": _dataclass_parser(IvfConfig),
        "langid": _dataclass_parser(LangIdConfig),
        "quality": _dataclass_parser(QualityConfig),
        "token_count": _dataclass_parser(TokenCountConfig),
        "fingerprint": _dataclass_parser(FingerprintConfig),
        "multimodal": _dataclass_parser(MultimodalConfig),
        "curation": _dataclass_parser(CurationConfig),
        "contamination": _dataclass_parser(ContaminationConfig),
        "repetition": _dataclass_parser(RepetitionConfig),
        "pii_redact": _dataclass_parser(PiiRedactConfig),
        "dataset_mix": _dataclass_parser(DatasetMixConfig),
        "sequence_packing": _dataclass_parser(SequencePackingConfig),
        "semdedup": _dataclass_parser(SemDedupConfig),
        "scalar_quantize": _dataclass_parser(ScalarQuantizeConfig),
        "substring_dup": _dataclass_parser(SubstringDupConfig),
        "tfidf": _dataclass_parser(TfidfConfig),
        "packing_manifest": _dataclass_parser(PackingManifestConfig),
        "corpus_shuffle": _dataclass_parser(CorpusShuffleConfig),
        "temperature_mix": _dataclass_parser(TemperatureMixConfig),
        "dedup_report": _dataclass_parser(DedupReportConfig),
        "source_stats": _dataclass_parser(SourceStatsConfig),
        "source_gate": _dataclass_parser(SourceGateConfig),
        "token_budget": _dataclass_parser(TokenBudgetConfig),
        "doc_chunks": _dataclass_parser(ChunkConfig),
        "chunk_dedup": _dataclass_parser(ChunkDedupConfig),
        "chunk_scrub": _dataclass_parser(ChunkScrubConfig),
        "lm_score": _dataclass_parser(BigramLmConfig),
        "ccnet_buckets": _dataclass_parser(CcnetBucketsConfig),
        "vocab_topk": _dataclass_parser(VocabTopkConfig),
        "gopher_rules": _dataclass_parser(GopherRulesConfig),
        "boilerplate_removal": _dataclass_parser(BoilerplateConfig),
        "dsir_score": _dataclass_parser(DsirConfig),
        "multimodal_decode": _dataclass_parser(MultimodalDecodeConfig),
        "decontaminate": _dataclass_parser(ContaminationConfig),
        "dataset_profile": _dataclass_parser(ProfileConfig),
        "grouped_quantiles": _dataclass_parser(GroupedQuantilesConfig),
        "line_clean": _dataclass_parser(LineCleanConfig),
        "canonical_selection": _dataclass_parser(CanonicalConfig),
        "stratified_split": _dataclass_parser(StratifiedSplitConfig),
        "source_cap": _dataclass_parser(SourceCapConfig),
        "incremental_dedup": _dataclass_parser(IncrementalDedupConfig),
        "asof_join": _dataclass_parser(_asof_config()),
        "sessionize": _dataclass_parser(_events_configs()[0]),
        "funnel": _dataclass_parser(_funnel_config()),
        "cohort_retention": _dataclass_parser(_cohort_config()),
        "table_diff": _dataclass_parser(_diff_config()),
        "hopping_agg": _dataclass_parser(_events_configs()[1]),
        "interval_join": _dataclass_parser(_interval_config()),
        "grouping_sets": _dataclass_parser(GroupingSetsConfig),
        "scd1_merge": _dataclass_parser(Scd1MergeConfig),
        "json_extract": _dataclass_parser(JsonExtractConfig),
        "pivot": _dataclass_parser(PivotConfig),
        "quarantine": _dataclass_parser(QuarantineConfig),
        "heavy_hitters": _dataclass_parser(HeavyHittersConfig),
        "histogram": _dataclass_parser(HistogramConfig),
        "sufficient_stats": _dataclass_parser(SufficientStatsConfig),
        "grouped_vocab": _dataclass_parser(GroupedVocabConfig),
        "exact_sample": _dataclass_parser(ExactSampleConfig),
        "quantile_gate": _dataclass_parser(QuantileGateConfig),
        "transition_matrix": _dataclass_parser(TransitionMatrixConfig),
        "locf": _dataclass_parser(LocfConfig),
        "rolling_agg": _dataclass_parser(RollingAggConfig),
        "blocked_linkage": _dataclass_parser(BlockedLinkageConfig),
        "source_overlap": _dataclass_parser(SourceOverlapConfig),
        "cooccurrence": _dataclass_parser(CooccurrenceConfig),
        "ohlc_bars": _dataclass_parser(OhlcBarsConfig),
        "attribution": _dataclass_parser(AttributionConfig),
        "k_anonymity": _dataclass_parser(KAnonymityConfig),
        "partitioned_roundtrip": _dataclass_parser(
            PartitionedRoundtripConfig),
        "compaction": _dataclass_parser(CompactionConfig),
        "percentile_rank": _dataclass_parser(PercentileRankConfig),
        "trending_topk": _dataclass_parser(TrendingConfig),
        "text_normalize": _dataclass_parser(TextNormalizeConfig),
        "conversion_paths": _dataclass_parser(ConversionPathConfig),
        "active_users": _dataclass_parser(ActiveUsersConfig),
        "proportional_sample": _dataclass_parser(
            ProportionalSampleConfig),
        "ann_index": _dataclass_parser(AnnIndexConfig),
        "url_gate": _dataclass_parser(UrlGateConfig),
        "tukey_outliers": _dataclass_parser(TukeyOutlierConfig),
        "negative_samples": _dataclass_parser(NegativeSamplesConfig),
        "profile_drift": _dataclass_parser(ProfileDriftConfig),
        "frame_sample": _dataclass_parser(MultimodalFrameSampleConfig),
        "image_resize": _dataclass_parser(MultimodalResizeConfig),
        "wav_decode": _dataclass_parser(WavDecodeConfig),
        "wav_stats": _dataclass_parser(WavStatsConfig),
        "ulaw_stats": _dataclass_parser(UlawStatsConfig),
        "png_decode": _dataclass_parser(PngDecodeConfig),
        "gif_frames": _dataclass_parser(GifFramesConfig),
        "kfold": _dataclass_parser(KFoldConfig),
    }


PARSERS = {
    "stage": parse_stage, "hub": parse_hub, "link": parse_link,
    "sat_v0": parse_sat_v0, "sat_v1": parse_sat_v1,
    "nh_sat": parse_nh_sat, "nh_link": parse_nh_link,
    "ma_sat_v0": parse_ma_sat_v0, "ma_sat_v1": parse_ma_sat_v1,
    "rec_track_sat": parse_rec_track_sat,
    "eff_sat_v0": parse_eff_sat_v0, "pit": parse_pit,
    "bridge": parse_bridge, "vault_checks": parse_vault_checks,
    "ref_hub": parse_ref_hub, "ref_sat_v0": parse_ref_sat_v0,
    "ref_sat_v1": parse_ref_sat_v1, "ref_table": parse_ref_table,
    "control_snap_v0": parse_control_snap_v0,
    "control_snap_v1": parse_control_snap_v1,
    **_llm_parsers(),
}


def parse(kind: str, yaml_metadata, name: str):
    """Generic entry: parse(kind, yaml_metadata, name) -> config."""
    return PARSERS[kind](yaml_metadata, name)
