"""Pipeline flavors mirroring the reference's entry points (SURVEY.md §3).

Each reference ``auto_annotate_<flavor>`` module is the same skeleton with a
different annotator chain + tag->TEI mapping; here each flavor is a function
``TokenizedDoc + targets -> TokenizedDoc`` composing the engine's operators:

- header:        SimpleMatcher (+ optional line numbers) —
                 auto_annotate_header.py:52-96
- segmentation:  SimpleMatcher -> SegmentationAnnotator —
                 auto_annotate_segmentation.py:93-104
- reference:     SubTagOnlyMatcher (or SimpleMatcher when segmenting) ->
                 ReferencePostProcessor [-> remove untagged] —
                 auto_annotate_reference.py:140-168
- fulltext:      SimpleMatcher -> ReplaceTags(note_other->None) ->
                 MergeGroupTags(list_item->list) [-> Expand prev/following] —
                 auto_annotate_fulltext.py:190-231

The flavor callable plugs into ``annotate_documents`` as the per-document
kernel's annotator chain.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Set

from ..kernel.doc import TokenizedDoc
from ..operators.annotate import (
    MatcherConfig,
    SimpleMatcher,
    SubTagOnlyMatcher,
    TargetAnnotation,
)
from ..operators.line_numbers import annotate_line_numbers
from ..operators.postprocess import (
    expand_to_following_untagged_tokens,
    expand_to_previous_untagged_tokens,
    merge_group_tags,
    remove_untagged_tokens,
    replace_tags,
)
from ..operators.reference import ReferenceAnnotatorConfig, ReferencePostProcessor
from ..operators.segmentation import (
    DEFAULT_SEGMENTATION_CONFIG_TEXT,
    SegmentationAnnotator,
    SegmentationConfig,
    parse_segmentation_config_string,
)

AnnotatorChain = Callable[[TokenizedDoc, List[TargetAnnotation]], TokenizedDoc]


def header_flavor(
    config: Optional[MatcherConfig] = None,
    detect_line_numbers: bool = False,
) -> AnnotatorChain:
    def annotate(doc: TokenizedDoc, targets: List[TargetAnnotation]) -> TokenizedDoc:
        if detect_line_numbers:
            annotate_line_numbers(doc)
        SimpleMatcher(targets, config).annotate(doc)
        return doc

    return annotate


def segmentation_flavor(
    matcher_config: Optional[MatcherConfig] = None,
    segmentation_config: Optional[SegmentationConfig] = None,
    preserve_tags: bool = False,
) -> AnnotatorChain:
    seg_config = segmentation_config or parse_segmentation_config_string(
        DEFAULT_SEGMENTATION_CONFIG_TEXT
    )

    def annotate(doc: TokenizedDoc, targets: List[TargetAnnotation]) -> TokenizedDoc:
        SimpleMatcher(targets, matcher_config).annotate(doc)
        SegmentationAnnotator(seg_config, preserve_tags=preserve_tags).annotate(doc)
        return doc

    return annotate


def reference_flavor(
    matcher_config: Optional[MatcherConfig] = None,
    reference_config: Optional[ReferenceAnnotatorConfig] = None,
    segment_references: bool = False,
    remove_untagged_enabled: bool = False,
) -> AnnotatorChain:
    def annotate(doc: TokenizedDoc, targets: List[TargetAnnotation]) -> TokenizedDoc:
        config = matcher_config or MatcherConfig(
            use_sub_annotations=True, extend_to_line_enabled=False
        )
        if segment_references:
            SimpleMatcher(targets, config).annotate(doc)
        else:
            SubTagOnlyMatcher(targets, config).annotate(doc)
        ReferencePostProcessor(reference_config).annotate(doc)
        if remove_untagged_enabled:
            remove_untagged_tokens(doc)
        return doc

    return annotate


def fulltext_flavor(
    matcher_config: Optional[MatcherConfig] = None,
    replaced_tag_by_tag: Optional[Dict[str, Optional[str]]] = None,
    group_tag_by_tag: Optional[Dict[str, str]] = None,
    expand_enabled_tags: Optional[Set[str]] = None,
) -> AnnotatorChain:
    replacements = (
        replaced_tag_by_tag if replaced_tag_by_tag is not None else {"note_other": None}
    )
    groups = group_tag_by_tag if group_tag_by_tag is not None else {"list_item": "list"}

    def annotate(doc: TokenizedDoc, targets: List[TargetAnnotation]) -> TokenizedDoc:
        SimpleMatcher(targets, matcher_config).annotate(doc)
        if replacements:
            replace_tags(doc, replacements)
        if groups:
            merge_group_tags(doc, groups.get)
        if expand_enabled_tags:
            expand_to_previous_untagged_tokens(doc, expand_enabled_tags)
            expand_to_following_untagged_tokens(doc, expand_enabled_tags)
        return doc

    return annotate
