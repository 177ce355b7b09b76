"""Target-annotation extraction from ground-truth XML (JATS-style).

Re-implements the reference's XML-mapping semantics
(/root/reference/sciencebeam_trainer_grobid_tools/core/annotation/target_annotation.py):
an INI config maps field names to XPaths with dotted option suffixes
(``.children``, ``.children.concat``, ``.children.range``, ``.regex``,
``.extract-regex``, ``.match-multiple``, ``.bonding``, ``.require-next``,
``.unmatched-parent-text``, ``.priority``, ``.sub.<name>``) plus the simple
matcher's per-tag options (``.match-prefix-regex``, ``.alternative-spellings``,
``.merge``, ``.extend-to-line``, ``.block``, ``.max_chunks`` —
annotation/simple_matching_annotator.py:756-816).

Uses stdlib ``xml.etree.ElementTree`` with a pragmatic XPath-subset rewriter
(leading ``//``, unions via ``|``, parenthesized union groups, ``[@a="v"]``
predicates) — the container environment has no lxml.  The config is parsed
once on the driver and broadcast; extraction runs per row inside
``mapInPandas``.
"""

from __future__ import annotations

import configparser
import json
import re
import xml.etree.ElementTree as ET
from itertools import chain
from typing import Dict, List, Optional, Set, Tuple, Union

from ..kernel.normalize import strip_whitespace
from .annotate import TagConfig, TargetAnnotation


class MappingSuffix:
    REGEX = ".regex"
    EXTRACT_REGEX = ".extract-regex"
    MATCH_MULTIPLE = ".match-multiple"
    BONDING = ".bonding"
    REQUIRE_NEXT = ".require-next"
    CHILDREN = ".children"
    CHILDREN_CONCAT = ".children.concat"
    CHILDREN_RANGE = ".children.range"
    UNMATCHED_PARENT_TEXT = ".unmatched-parent-text"
    PRIORITY = ".priority"
    SUB = ".sub"


# ---------------------------------------------------------------------------
# config parsing


def parse_xml_mapping_string(config_text: str) -> Dict[str, Dict[str, str]]:
    """Parse the INI mapping into {section(root tag): {key: value}}
    (target_annotation.py:71-81)."""
    parser = configparser.ConfigParser(interpolation=None)
    parser.read_string(config_text)
    return {section: dict(parser.items(section)) for section in parser.sections()}


def _parse_regex_option(regex_str: Optional[str]) -> Optional[str]:
    """Optionally quoted regex (simple_matching_annotator.py:765-774)."""
    if not regex_str:
        return regex_str
    if len(regex_str) >= 2 and regex_str.startswith('"') and regex_str.endswith('"'):
        regex_str = regex_str[1:-1]
    re.compile(regex_str)
    return regex_str


def _parse_alternative_spellings(value: Optional[str]) -> Dict[str, List[str]]:
    """``Key=Alt 1,Alt 2`` per line (simple_matching_annotator.py:777-790)."""
    if not value:
        return {}
    result: Dict[str, List[str]] = {}
    for line in value.splitlines():
        line = line.strip()
        if not line:
            continue
        key, alternatives = line.split("=", maxsplit=1)
        result[key.strip()] = alternatives.strip().split(",")
    return result


def _parse_bool(value: Optional[str], default: bool) -> bool:
    if value is None:
        return default
    return value.strip().lower() in ("1", "true", "yes", "on", "y", "t")


def get_tag_config_map(xml_mapping: Dict[str, Dict[str, str]]) -> Dict[str, TagConfig]:
    """Flatten all sections and build per-field TagConfig
    (simple_matching_annotator.py:793-836)."""
    fields = {
        key
        for section in xml_mapping.values()
        for key in section.keys()
        if "." not in key
    }
    flat = {k: v for section in xml_mapping.values() for k, v in section.items()}
    return {
        field: TagConfig(
            match_prefix_regex=_parse_regex_option(flat.get(field + ".match-prefix-regex")),
            alternative_spellings=_parse_alternative_spellings(
                flat.get(field + ".alternative-spellings")
            ),
            merge_enabled=_parse_bool(flat.get(field + ".merge"), True),
            extend_to_line_enabled=_parse_bool(flat.get(field + ".extend-to-line"), True),
            max_chunks=int(flat.get(field + ".max_chunks", "1")),
            block_name=flat.get(field + ".block"),
        )
        for field in fields
    }


# ---------------------------------------------------------------------------
# XPath subset evaluation (ElementTree-based)


def _rewrite_xpath(xpath: str) -> List[str]:
    """Normalize to ElementTree syntax; expand top-level unions."""
    xpath = xpath.strip()
    # expand parenthesized union group prefix: (a | b)/rest
    m = re.match(r"^\((.+?)\)(/.*)?$", xpath)
    if m and "|" in m.group(1):
        suffix = m.group(2) or ""
        return [
            sub
            for part in m.group(1).split("|")
            for sub in _rewrite_xpath(part.strip() + suffix)
        ]
    # top-level union
    depth = 0
    for i, ch in enumerate(xpath):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "|" and depth == 0:
            return _rewrite_xpath(xpath[:i]) + _rewrite_xpath(xpath[i:][1:])
    if xpath.startswith("//"):
        xpath = "." + xpath
    elif xpath.startswith("/"):
        xpath = "." + xpath
    return [xpath]


def match_xpaths(node: ET.Element, xpaths: List[str]) -> List[ET.Element]:
    """Union of per-xpath matches, document order preserved per xpath
    (target_annotation.py:217-218)."""
    return list(
        chain.from_iterable(
            node.findall(rewritten)
            for xpath in xpaths
            for rewritten in _rewrite_xpath(xpath)
        )
    )


def parse_xpaths(value: Optional[str]) -> Optional[List[str]]:
    """Multi-line xpath option -> list (target_annotation.py:213-214)."""
    if not value:
        return None
    return [line.strip() for line in value.strip().split("\n") if line.strip()]


# ---------------------------------------------------------------------------
# text content helpers (semantics of sciencebeam_utils.utils.xml)


def text_content(node: ET.Element, exclude: Optional[Set[int]] = None) -> str:
    """All text in the subtree; excluded elements contribute only their tail."""
    parts: List[str] = [node.text or ""]
    for child in node:
        if not exclude or id(child) not in exclude:
            parts.append(text_content(child, exclude))
        parts.append(child.tail or "")
    return "".join(parts)


def immediate_text(node: ET.Element) -> List[str]:
    parts = [node.text or ""] + [child.tail or "" for child in node]
    return [p for p in parts if p]


def stripped_text_content(node: ET.Element, exclude: Optional[Set[int]] = None) -> str:
    return strip_whitespace(text_content(node, exclude).strip())


# ---------------------------------------------------------------------------
# children / concat / range extraction (target_annotation.py:137-252)


def _build_parent_map(root: ET.Element) -> Dict[int, Optional[ET.Element]]:
    parents: Dict[int, Optional[ET.Element]] = {id(root): None}
    for parent in root.iter():
        for child in parent:
            parents[id(child)] = parent
    return parents


def exclude_parents(
    children: List[ET.Element], parent_map: Dict[int, Optional[ET.Element]]
) -> List[ET.Element]:
    all_parents = {
        id(parent_map[id(child)])
        for child in children
        if parent_map.get(id(child)) is not None
    }
    return [child for child in children if id(child) not in all_parents]


def _extract_children_source_list(
    parent: ET.Element,
    source_list: List[Dict[str, str]],
    parent_map: Dict[int, Optional[ET.Element]],
) -> Tuple[List[str], Set[int]]:
    used_nodes: Set[int] = set()
    values: List[str] = []
    for source in source_list:
        xpath = source.get("xpath")
        if xpath:
            matching = exclude_parents(match_xpaths(parent, [xpath]), parent_map)
            if not matching:
                return [], set()
            used_nodes |= {id(n) for n in matching}
            value = " ".join(stripped_text_content(n) for n in matching)
        else:
            value = source.get("value", "")
        values.append(value or "")
    return values, used_nodes


def _extract_children_concat(
    parent: ET.Element,
    children_concat: List[List[Dict[str, str]]],
    parent_map: Dict[int, Optional[ET.Element]],
) -> Tuple[List[str], Set[int]]:
    used_nodes: Set[int] = set()
    values: List[str] = []
    for concat_item in children_concat:
        item_values, item_used = _extract_children_source_list(parent, concat_item, parent_map)
        used_nodes |= item_used
        if item_values:
            values.append("".join(item_values))
    return values, used_nodes


def _extract_children_range(
    parent: ET.Element,
    children_range: List[Dict[str, Dict[str, str]]],
    parent_map: Dict[int, Optional[ET.Element]],
) -> Tuple[List[str], List[str], Set[int]]:
    used_nodes: Set[int] = set()
    values: List[str] = []
    standalone_values: List[str] = []
    for range_item in children_range:
        item_values, item_used = _extract_children_source_list(
            parent, [range_item.get("min", {}), range_item.get("max", {})], parent_map
        )
        if len(item_values) == 2:
            item_values = [s.strip() for s in item_values]
            if all(s.isdigit() for s in item_values):
                low, high = int(item_values[0]), int(item_values[1])
                range_values = [str(x) for x in range(low, high + 1)]
                if range_item.get("standalone"):
                    standalone_values.extend(range_values)
                else:
                    values.extend(range_values)
                used_nodes |= item_used
    return values, standalone_values, used_nodes


def _extract_children(
    parent: ET.Element,
    children_xpaths: List[str],
    children_concat: List[List[Dict[str, str]]],
    children_range: List[Dict[str, Dict[str, str]]],
    unmatched_parent_text: bool,
    parent_map: Dict[int, Optional[ET.Element]],
) -> Tuple[List[str], List[str]]:
    concat_values, concat_used = _extract_children_concat(parent, children_concat, parent_map)
    range_values, standalone_values, range_used = _extract_children_range(
        parent, children_range, parent_map
    )
    used_nodes = concat_used | range_used
    other_children = [
        node for node in match_xpaths(parent, children_xpaths) if id(node) not in used_nodes
    ]
    other_excl_parents = exclude_parents(other_children, parent_map)
    text_values = [
        s
        for s in (
            [stripped_text_content(n).strip() for n in other_excl_parents]
            + [v.strip() for v in concat_values]
            + [v.strip() for v in range_values]
        )
        if s
    ]
    if len(other_excl_parents) != len(other_children):
        kept = {id(n) for n in other_excl_parents}
        for child in other_children:
            if id(child) not in kept:
                text_values.extend(s for s in (t.strip() for t in immediate_text(child)) if s)
    if unmatched_parent_text:
        value = stripped_text_content(
            parent, exclude={id(n) for n in other_children} | used_nodes
        ).strip()
        if value and value not in text_values:
            text_values.append(value)
    return text_values, standalone_values


# ---------------------------------------------------------------------------
# regex projections (target_annotation.py:129-134,279-301)


def _apply_pattern(s: str, compiled: "re.Pattern[str]") -> str:
    m = compiled.match(s)
    if m:
        return m.group(1)
    return s


def extract_using_regex(s: str, compiled: "re.Pattern[str]") -> Union[str, List[str]]:
    result: Optional[List[str]] = None
    start = 0
    for m in compiled.finditer(s):
        if result is None:
            result = []
        if start < m.start(1):
            result.append(s[start : m.start(1)].strip())
        result.append(m.group(1))
        start = m.end(1) + 1
    if result is None:
        return s
    if start < len(s):
        result.append(s[start:].strip())
    if len(result) == 1:
        return result[0]
    result.append(s)  # also include the full string
    return result


def _flatten_if_nested(values: List) -> List[str]:
    out: List[str] = []
    for v in values:
        if isinstance(v, list):
            out.extend(_flatten_if_nested(v))
        else:
            out.append(v)
    return out


# ---------------------------------------------------------------------------
# sub annotations (target_annotation.py:267-272,304-327)


def _get_sub_mapping(mapping: Dict[str, str], field: str) -> Dict[str, str]:
    prefix = field + MappingSuffix.SUB + "."
    return {
        k[len(prefix):]: v
        for k, v in mapping.items()
        if k.startswith(prefix) and "." not in k[len(prefix):]
    }


def _extract_sub_annotations(
    parent_node: ET.Element,
    sub_xpaths: Dict[str, str],
    mapping: Dict[str, str],
    parent_key: str,
) -> List[TargetAnnotation]:
    if not sub_xpaths:
        return []
    sub_annotations: List[TargetAnnotation] = []
    for sub_tag, sub_xpath in sub_xpaths.items():
        extract_pattern = mapping.get(
            parent_key + MappingSuffix.SUB + "." + sub_tag + MappingSuffix.EXTRACT_REGEX
        )
        compiled = re.compile(extract_pattern) if extract_pattern else None
        for node in match_xpaths(parent_node, [sub_xpath]):
            value: Union[str, List[str], None] = stripped_text_content(node)
            if value:
                value = strip_whitespace(value).strip()
            if compiled is not None and value:
                value = extract_using_regex(value, compiled)
            if value:
                sub_annotations.append(TargetAnnotation(value, sub_tag))
    return sub_annotations


# ---------------------------------------------------------------------------
# main entry (target_annotation.py:330-448)


def xml_root_to_target_annotations(
    xml_root: ET.Element, xml_mapping: Dict[str, Dict[str, str]]
) -> List[TargetAnnotation]:
    if xml_root.tag not in xml_mapping:
        raise ValueError(
            "unrecognised root tag: %r (available: %r)"
            % (xml_root.tag, sorted(xml_mapping.keys()))
        )
    mapping = xml_mapping[xml_root.tag]
    field_names = [k for k in mapping.keys() if "." not in k]
    parent_map = _build_parent_map(xml_root)
    node_positions = {id(node): i for i, node in enumerate(xml_root.iter())}

    def flag(key: str, suffix: str) -> bool:
        return mapping.get(key + suffix) == "true"

    annotated: List[Tuple[Tuple, TargetAnnotation]] = []
    for field in field_names:
        match_multiple = flag(field, MappingSuffix.MATCH_MULTIPLE)
        bonding = flag(field, MappingSuffix.BONDING)
        require_next = flag(field, MappingSuffix.REQUIRE_NEXT)
        unmatched_parent_text = flag(field, MappingSuffix.UNMATCHED_PARENT_TEXT)
        children_xpaths = parse_xpaths(mapping.get(field + MappingSuffix.CHILDREN))
        children_concat = json.loads(mapping.get(field + MappingSuffix.CHILDREN_CONCAT) or "[]")
        children_range = json.loads(mapping.get(field + MappingSuffix.CHILDREN_RANGE) or "[]")
        pattern = mapping.get(field + MappingSuffix.REGEX)
        compiled = re.compile(pattern) if pattern else None
        extract_pattern = mapping.get(field + MappingSuffix.EXTRACT_REGEX)
        extract_compiled = re.compile(extract_pattern) if extract_pattern else None
        priority = int(mapping.get(field + MappingSuffix.PRIORITY, "0"))
        sub_xpaths = _get_sub_mapping(mapping, field)
        xpaths = parse_xpaths(mapping[field])
        if not xpaths:
            continue
        for node in match_xpaths(xml_root, xpaths):
            node_pos = node_positions.get(id(node))
            sub_annotations = _extract_sub_annotations(node, sub_xpaths, mapping, field)
            if children_xpaths:
                text_values, standalone_values = _extract_children(
                    node,
                    children_xpaths,
                    children_concat,
                    children_range,
                    unmatched_parent_text,
                    parent_map,
                )
            else:
                stripped = stripped_text_content(node).strip()
                text_values = [stripped] if stripped else []
                standalone_values = []
            if compiled:
                text_values = [v for v in (_apply_pattern(s, compiled) for s in text_values) if v]
            if extract_compiled:
                text_values = [
                    v for v in (extract_using_regex(s, extract_compiled) for s in text_values) if v
                ]
            text_values = _flatten_if_nested(text_values)
            if text_values:
                value: Union[str, List[str]] = (
                    text_values[0]
                    if len(text_values) == 1
                    else sorted(text_values, key=lambda s: -len(s))
                )
                annotated.append(
                    (
                        (-priority, node_pos),
                        TargetAnnotation(
                            value,
                            field,
                            match_multiple=match_multiple,
                            bonding=bonding,
                            require_next=require_next,
                            sub_annotations=sub_annotations,
                        ),
                    )
                )
            for i, standalone_value in enumerate(standalone_values):
                annotated.append(
                    (
                        (-priority, node_pos, i),
                        TargetAnnotation(
                            standalone_value,
                            field,
                            match_multiple=match_multiple,
                            bonding=bonding,
                            sub_annotations=sub_annotations,
                        ),
                    )
                )
    annotated.sort(key=lambda x: tuple(-1 if v is None else v for v in x[0]))
    return [t for _, t in annotated]


def xml_string_to_target_annotations(
    xml_text: Union[str, bytes], xml_mapping: Dict[str, Dict[str, str]]
) -> List[TargetAnnotation]:
    if isinstance(xml_text, bytes):
        xml_text = xml_text.decode("utf-8", errors="replace")
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        # broken-XML recovery (reference S5/F13: utils/xml.py:163-234, used
        # by the figure/table/fulltext flavors)
        from .xmlfix import fix_xml

        root = ET.fromstring(fix_xml(xml_text))
    return xml_root_to_target_annotations(root, xml_mapping)
