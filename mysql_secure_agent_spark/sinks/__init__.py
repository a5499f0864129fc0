from .jsonl_changelog import (  # noqa: F401
    changelog_jsonl_lines,
    table_definition_line,
    write_jsonl_changelog,
)
