# Message logging scopes (flow_tpu.message): indentation, timing line,
# nesting — the tracing layer of SURVEY.md §5.1.
import logging

from flow_tpu.message import Message, begin, end, info, logger, set_log_level


def test_message_nesting_and_timing(caplog):
    set_log_level(logging.INFO)
    with caplog.at_level(logging.INFO, logger="flow_tpu"):
        with Message("outer"):
            info("inside")
            with Message("inner"):
                pass
    set_log_level(logging.WARNING)
    msgs = [r.message for r in caplog.records]
    assert msgs[0] == "outer"
    assert msgs[1] == "  inside"  # indented one level
    assert msgs[2] == "  inner"  # header prints at parent depth (dolfin style)
    assert "inner done [" in msgs[3]
    assert "outer done [" in msgs[-1]


def test_begin_end_balance(caplog):
    set_log_level(logging.INFO)
    with caplog.at_level(logging.INFO, logger="flow_tpu"):
        begin("phase")
        info("a")
        end()
        info("b")
    set_log_level(logging.WARNING)
    msgs = [r.message for r in caplog.records]
    assert msgs == ["phase", "  a", "b"]
