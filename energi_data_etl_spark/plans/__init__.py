from .inspect import explain_str, assert_pushed_filter, assert_broadcast_join, scan_read_schema  # noqa: F401
