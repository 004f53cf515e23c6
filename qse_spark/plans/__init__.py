from .audit import explain_str, assert_pushed_filters, plan_summary  # noqa: F401
