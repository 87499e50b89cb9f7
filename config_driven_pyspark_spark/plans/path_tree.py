"""PathNode — the logical plan for nested-field transforms.

Role parity: the reference's ``NodeFunctions`` UserDict tree
(``/root/reference/src/config_driven_pyspark/functioniser.py:210-233``) built
by ``_build_nodes`` (``functioniser.py:152-196``). Differences by design:

- a plain dataclass tree instead of a UserDict subclass;
- each node records ``wrappers`` — the ordered container tokens on its
  schema segment (``'a'`` per ``[]``, ``'m'`` per ``{}``) — rather than a
  boolean ``is_array``. The lowering emits one ``F.transform`` per array
  level (fixing the reference's nested-``array<array<T>>`` edge where both
  brackets collapse into a single boolean — SURVEY.md §1.2) and one
  ``F.transform_values`` per map level (maps are opaque leaves in the
  reference).
- case-insensitive child addressing via a lowercased key dict (the reference
  scans keys with ``.lower()`` in ``iget`` — ``functioniser.py:229-233``).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Optional

from config_driven_pyspark_spark.functions.registry import DfFunction
from config_driven_pyspark_spark.schema import limit_depth, strip_brackets, wrappers_of

_logger = logging.getLogger(__name__)


@dataclass
class PathNode:
    """One segment of a configured nested path.

    ``name`` is the bracket-free field name (schema casing when the segment
    was resolved from the schema, config casing for created fields);
    ``wrappers`` is the ordered container-unwrap sequence the lowering must
    emit around this node (``'a'`` → ``F.transform``, ``'m'`` →
    ``F.transform_values``); ``function`` is the (possibly composed) Column
    function to apply at this node, or None for pass-through interior nodes.
    """

    name: str
    wrappers: tuple[str, ...] = ()
    function: Optional[DfFunction] = None
    children: dict[str, "PathNode"] = field(default_factory=dict)
    # function applied to this node's map KEYS (the `{keys}` path token);
    # lowered with F.transform_keys at the node's first map wrapper level
    key_function: Optional[DfFunction] = None

    def child(self, name: str) -> Optional["PathNode"]:
        """Case-insensitive child lookup."""
        return self.children.get(name.lower())

    def put_child(self, node: "PathNode") -> "PathNode":
        existing = self.children.get(node.name.lower())
        if existing is not None:
            return existing
        self.children[node.name.lower()] = node
        return node


def resolve_tokens(config_path: str, flat_schema: list[str]) -> Optional[str]:
    """Resolve a config path against the flattened schema.

    Returns the tokenized path (with ``[]`` markers and schema casing), or
    None when absent. Supports partial paths that target a struct/array node
    itself: prefix match then depth-limit. Parity:
    ``functioniser.py:130-149`` (``_get_field_name_with_tokens``).
    """
    want = config_path.lower()
    for tokenised in flat_schema:
        plain = tokenised.lower().replace("[]", "").replace("{}", "")
        if plain == want or plain.startswith(want + "."):
            return limit_depth(tokenised, config_path)
    return None


KEY_TOKEN = "{keys}"


def _add_key_function(
    root: PathNode, config_path: str, fn: DfFunction, flat_schema: list[str]
) -> None:
    """Attach a map-KEY transform: path ``some.map.{keys}`` applies ``fn``
    to the keys of the map at ``some.map`` (which must resolve to a
    map-typed node — its schema segment carries a ``{}`` token). For nested
    containers the rewrite binds to the node's FIRST map level in wrapper
    order: ``array<map<..>>`` rewrites each element map's keys,
    ``map<map<..>>`` the outer map's keys (inner-map keys are not
    addressable — extend the token if ever needed). Repeat-adds compose via
    the transformer's per-path composition, exactly like value paths."""
    parent_path = config_path.rsplit(".", 1)[0]
    if parent_path == config_path:  # bare "{keys}" with no map path
        raise ValueError(f"{KEY_TOKEN} requires a map path before it: {config_path!r}")
    parent_tokens = resolve_tokens(parent_path, flat_schema)
    if parent_tokens is None:
        raise ValueError(f"Map path {parent_path!r} for {KEY_TOKEN} not found in input schema")
    segments = parent_tokens.split(".")
    if "m" not in wrappers_of(segments[-1]):
        raise ValueError(
            f"{KEY_TOKEN} target {parent_path!r} is not map-typed "
            f"(resolved segment {segments[-1]!r} has no map level)"
        )
    current = root
    for segment in segments:
        node = current.child(strip_brackets(segment))
        if node is None:
            node = current.put_child(
                PathNode(strip_brackets(segment), wrappers_of(segment))
            )
        current = node
    current.key_function = fn


def build_path_tree(
    functions: dict[str, DfFunction], flat_schema: list[str]
) -> PathNode:
    """Build the PathNode tree for all configured ``path → function`` entries.

    Creation contract (parity with ``functioniser.py:160-183``, pinned by
    ``test_functioniser.py:289-318``):

    - path found in schema → transform it;
    - path absent, no dot → new root column (warn);
    - path absent, dotted, parent resolves → new member on that parent (warn);
    - path absent, parent absent → ``ValueError``.
    """
    root = PathNode("<root>")

    for config_path, fn in functions.items():
        if config_path.split(".")[-1] == KEY_TOKEN:
            _add_key_function(root, config_path, fn, flat_schema)
            continue
        tokens = resolve_tokens(config_path, flat_schema)
        if tokens is None:
            _logger.warning(
                "Field %s not found in input schema. Will attempt to create on parent.",
                config_path,
            )
            if "." not in config_path:
                tokens = config_path
            else:
                parent_path, leaf = config_path.rsplit(".", 1)
                parent_tokens = resolve_tokens(parent_path, flat_schema)
                if not parent_tokens:
                    raise ValueError(
                        f"Parent struct for {config_path} not found in input schema"
                    )
                tokens = f"{parent_tokens}.{leaf}"

        current = root
        segments = tokens.split(".")
        for segment in segments:
            node = current.child(strip_brackets(segment))
            if node is None:
                node = current.put_child(
                    PathNode(strip_brackets(segment), wrappers_of(segment))
                )
            current = node
        current.function = fn

    return root
