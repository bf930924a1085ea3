from .scalars import (  # noqa: F401
    coerce_bool_value,
    normalize_session_label,
    site_whole_word_match,
    with_composite_id,
)
