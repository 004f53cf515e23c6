from .audit import (explain_str, assert_pushed_filters,  # noqa: F401
                    assert_broadcast_join, assert_read_schema_only,
                    executed_plan_str, executed_summary, plan_summary)
