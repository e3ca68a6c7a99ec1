"""Minimal DOM kernel built on the stdlib ``html.parser``.

The reference engine delegates DOM work to the external ``justhtml``
package (pankaj28843/article-extractor pyproject.toml:24), which is not
installable in this environment.  This kernel provides the small node
surface the extraction semantics actually need (see SURVEY.md §1.1):
tree building with HTML5-ish auto-closing, a mini CSS ``query()``
(tag / #id / .class / [attr="v"] / [attr^="v"] / [attr*="v"] / comma
lists), ``to_text`` / ``to_html`` / ``to_markdown``, ``remove_child``,
``attrs`` / ``parent`` / ``children``.
"""

from .node import Node
from .parser import parse_html

__all__ = ["Node", "parse_html"]
