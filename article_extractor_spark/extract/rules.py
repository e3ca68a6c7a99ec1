"""Scoring rules and thresholds for readability-style extraction.

The *values* reproduce the reference's scoring semantics exactly
(article-extractor constants.py — themselves derived from the public
Readability.js / Postlight Parser heuristics); the organization is ours.
Regexes are compiled once per Python worker at module import, which on
Spark amortizes across every Arrow batch the executor processes.
"""

from __future__ import annotations

import re

# --------------------------------------------------------------------
# Tag-level base scores (reference constants.py:11-39).
# --------------------------------------------------------------------
CONTENT_TAG_BONUS = {"div": 5, "article": 5, "section": 5, "main": 5}
QUOTE_TAG_BONUS = {"pre": 3, "blockquote": 3, "td": 3}
LIST_TAG_PENALTY = {
    t: -3 for t in ("form", "ol", "ul", "dl", "dd", "dt", "li", "address")
}
HEADING_TAG_PENALTY = {t: -5 for t in ("h1", "h2", "h3", "h4", "h5", "h6", "th")}
NEUTRAL_TAGS = {"p": 0, "span": 0}

TAG_BASE_SCORE: dict[str, int] = {
    **CONTENT_TAG_BONUS,
    **QUOTE_TAG_BONUS,
    **LIST_TAG_PENALTY,
    **HEADING_TAG_PENALTY,
    **NEUTRAL_TAGS,
}


def _any_of(terms: tuple[str, ...]) -> re.Pattern[str]:
    return re.compile("|".join(terms), re.IGNORECASE)


# --------------------------------------------------------------------
# class/id hint patterns (reference constants.py:46-196).
# --------------------------------------------------------------------
UNLIKELY_HINTS = (
    "ad-break", "adbox", "advert", "addthis", "agegate", "aux", "banner",
    "breadcrumb", "combx", "comment", "community", "cookie", "disqus",
    "extra", "footer", "gdpr", "header", "hidden", "legends", "menu",
    "menubar", "meta", "mw-jump", "nav", "navigation", "newsletter",
    "outbrain", "pager", "pagination", "popup", "privacy", "promo", "rail",
    "related", "remark", "rss", "share", "shoutbox", "sidebar",
    "skyscraper", "social", "sponsor", "subscribe", "taboola", "teaser",
    "toolbar", "tweet", "twitter", "widget", "yom-remote",
)

MAYBE_OK_HINTS = (
    "and", "article", "body", "blogindex", "column", "content", "entry",
    "hentry", "main", "page", "posts", "shadow",
)

POSITIVE_HINTS = (
    "article", "articlecontent", "blog", "body", "content", "entry",
    "hentry", "h-entry", "main", "page", "pagination", "post", "story",
    "text", r"[-_]copy", r"\Bcopy",
)

NEGATIVE_HINTS = (
    "-ad-", "hidden", r"^hid$", r" hid$", r" hid ", r"^hid ", "banner",
    "combx", "comment", "com-", "contact", "disqus", "extra", "foot",
    "footer", "footnote", "gdpr", "header", "legends", "masthead", "media",
    "meta", "nav", "outbrain", "pager", "popup", "promo", "related",
    "remark", "rss", "share", "shoutbox", "sidebar", "skyscraper",
    "sponsor", "taboola", "teaser", "widget",
)

PHOTO_HINTS = ("figure", "photo", "image", "caption")

RX_UNLIKELY = _any_of(UNLIKELY_HINTS)
RX_MAYBE_OK = _any_of(MAYBE_OK_HINTS)
RX_POSITIVE = _any_of(POSITIVE_HINTS)
RX_NEGATIVE = _any_of(NEGATIVE_HINTS)
RX_PHOTO = _any_of(PHOTO_HINTS)
RX_READABILITY_ASSET = re.compile(r"entry-content-asset", re.IGNORECASE)
RX_COMMA = re.compile(r",\s*")

# class/id weights (reference scorer.py:66-100)
POSITIVE_WEIGHT = 25.0
NEGATIVE_WEIGHT = -25.0
PHOTO_WEIGHT = 10.0
READABILITY_ASSET_WEIGHT = 25.0

# --------------------------------------------------------------------
# Thresholds (reference constants.py:199-203).
# --------------------------------------------------------------------
MIN_CANDIDATE_CHARS = 500       # MIN_CHAR_THRESHOLD
MIN_PARAGRAPH_CHARS = 25        # MIN_PARAGRAPH_LENGTH
DEFAULT_MIN_WORDS = 150         # MIN_WORD_COUNT (server default)
LINK_DENSITY_PENALTY_ABOVE = 0.25

# --------------------------------------------------------------------
# Document cleaning (reference constants.py:207-215, 269-278).
# --------------------------------------------------------------------
STRIP_TAGS = frozenset(
    # "form" intentionally NOT stripped: ASP.NET pages wrap all content
    # in a page-level <form> (reference constants.py:266-268).
    {"aside", "footer", "header", "nav", "noscript", "script", "style", "svg"}
)
UNLIKELY_ARIA_ROLES = (
    "menu", "menubar", "complementary", "navigation",
    "alert", "alertdialog", "dialog",
)
ROLE_STRIP_SELECTOR = ", ".join(f'[role="{r}"]' for r in UNLIKELY_ARIA_ROLES)


def strip_selector_for(keep: frozenset[str] = frozenset()) -> str:
    """Tag-strip selector, optionally keeping some tags (host overrides,
    reference extractor.py:197-206)."""
    return ", ".join(sorted(STRIP_TAGS - keep))


STRIP_SELECTOR_DEFAULT = strip_selector_for()

# --------------------------------------------------------------------
# Candidate refinement (reference candidate_finder.py:88-162).
# --------------------------------------------------------------------
REFINE_SCORE_RATIO = 0.85
REFINE_LENGTH_RATIO = 0.5
REFINE_DENSITY_IMPROVEMENT = 0.8
REFINE_MAX_ROUNDS = 3
REFINE_RELAXED_SCORE_RATIO = 0.3
REFINE_ARTICLE_SCORE_RATIO = 0.65

# --------------------------------------------------------------------
# Image validity (reference content_sanitizer.py:19-40,145-186).
# --------------------------------------------------------------------
TRACKING_IMAGE_FILENAMES = frozenset(
    {
        "pixel.gif", "pixel.png", "1x1.gif", "1x1.png",
        "spacer.gif", "spacer.png", "blank.gif", "blank.png",
    }
)
TRACKING_HOST_PREFIXES = ("tracking.", "analytics.", "metrics.")
SAFE_DATA_IMAGE_PREFIXES = (
    "data:image/png", "data:image/jpeg", "data:image/jpg", "data:image/gif",
    "data:image/webp", "data:image/avif", "data:image/bmp",
)
IMAGE_EXTENSIONS = frozenset(
    {
        "jpg", "jpeg", "png", "gif", "webp", "svg", "bmp",
        "avif", "apng", "tiff", "jfif",
    }
)
MIN_IMAGE_BASENAME_CHARS = 2

# --------------------------------------------------------------------
# Boilerplate-block pruning (reference content_sanitizer.py:221-295).
# --------------------------------------------------------------------
BOILERPLATE_PHRASES = (
    "privacy policy", "cookie policy", "terms of use",
    "terms and conditions", "more from", "more recent articles",
    "related posts", "join the conversation", "add a comment", "see also",
    "free newsletter", "share this",
)

RX_BOILERPLATE_ATTRS = re.compile(
    r"comment|newsletter|subscribe|share|social|recent|"
    r"metabox|worth|promo|advert|ad-|entryfooter|pagenav|"
    r"article-single__tags|articlebodyforbidden|author-bio|deepdive|"
    r"sso|login|signin|register|full-reg-form",
    re.IGNORECASE,
)
RX_BOILERPLATE_ATTRS_STRONG = re.compile(
    r"comment|newsletter|subscribe|ad-container|advert|entryfooter|pagenav|"
    r"deepdive|sso|full-reg-form|register|login",
    re.IGNORECASE,
)

# --------------------------------------------------------------------
# URL rewriting targets (reference url_normalizer.py:18-29).
# --------------------------------------------------------------------
URL_ATTRIBUTES: dict[str, tuple[str, ...]] = {
    "a": ("href",),
    "img": ("src", "srcset"),
    "source": ("src", "srcset"),
    "video": ("src", "poster"),
    "audio": ("src",),
    "track": ("src",),
    "link": ("href",),
    "iframe": ("src",),
    "embed": ("src",),
    "object": ("data",),
}

UNSAFE_URL_SCHEMES = ("javascript:", "vbscript:", "data:text/html")

# --------------------------------------------------------------------
# Safe-mode output whitelist (reference constants.py:227-263 documents
# the intent of justhtml.sanitize.sanitize_dom).
# --------------------------------------------------------------------
SAFE_OUTPUT_TAGS = frozenset(
    {
        "a", "abbr", "b", "blockquote", "br", "code", "em", "figcaption",
        "figure", "h1", "h2", "h3", "h4", "h5", "h6", "hr", "i", "img",
        "li", "ol", "p", "pre", "q", "s", "strong", "sub", "sup", "table",
        "tbody", "td", "th", "thead", "tr", "u", "ul",
    }
)
# Tags whose entire subtree is dropped in safe mode (executable/embedded).
# Form controls and buttons are NOT dropped: their text survives the
# reference's safe-mode output (golden corpus retains form/button text),
# and page-level <form> wrappers must never lose content
# (reference constants.py:266-268).
SAFE_MODE_DROP_TAGS = frozenset(
    {"script", "style", "noscript", "iframe", "object", "embed",
     "applet", "svg", "template"}
)
SAFE_OUTPUT_ATTRS = frozenset(
    {"href", "src", "srcset", "alt", "title", "colspan", "rowspan",
     "datetime", "lang", "dir"}
)

# Transient-404 salvage heuristic (reference extractor.py:434-447).
TRANSIENT_MIN_HTML_LEN = 500
TRANSIENT_MARKERS = ("<article", "<main", "</p>")

# infoworld leaked-CSS scrub (reference extractor.py:208-211).
RX_INFOWORLD_CSS_ARTIFACT = re.compile(
    r"\.?section-block\[data-block=\"hero-text-figure\"\].*?"
    r"border-radius:\s*0 0 0 0;\s*}",
    re.IGNORECASE | re.DOTALL,
)
