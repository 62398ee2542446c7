from .textops import (
    LINK_REGEX,
    TEXT_REGEX,
    TITLE_REGEX,
    extract_doc_id,
    extract_links,
    extract_text_body,
    extract_text_full,
    extract_title,
    strip_non_alpha,
    tokens,
)

__all__ = [
    "LINK_REGEX",
    "TEXT_REGEX",
    "TITLE_REGEX",
    "extract_doc_id",
    "extract_links",
    "extract_text_body",
    "extract_text_full",
    "extract_title",
    "strip_non_alpha",
    "tokens",
]
