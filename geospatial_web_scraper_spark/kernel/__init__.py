from .html_kernel import (  # noqa: F401
    Node,
    add_to_stringbuilder,
    extract_links,
    extract_metadata,
    go_path_base,
    go_path_ext,
    parse_html,
)
