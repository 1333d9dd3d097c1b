from marie_tpu.metrics import Metric, MetricRegistry, MetricUnit, collect_system_metrics


def test_metric_summary():
    m = Metric("latency", MetricUnit.MILLISECONDS)
    for v in [10, 20, 30, 40, 50]:
        m.record(v)
    s = m.summary()
    assert s["count"] == 5
    assert s["min"] == 10 and s["max"] == 50
    assert s["mean"] == 30
    assert s["unit"] == "milliseconds"


def test_registry_dimensions_and_collectors():
    reg = MetricRegistry()
    a = reg.metric("req_time", MetricUnit.SECONDS, {"executor": "a"})
    b = reg.metric("req_time", MetricUnit.SECONDS, {"executor": "b"})
    assert a is not b
    assert reg.metric("req_time", MetricUnit.SECONDS, {"executor": "a"}) is a

    reg.add_collector(lambda: {"custom.gauge": 42.0})
    reg.collect()
    report = reg.report()
    assert any("custom.gauge" in k for k in report)


def test_system_metrics_collect():
    out = collect_system_metrics()
    assert out["process.memory_rss_bytes"] > 0
    assert 0 <= out["system.memory_percent"] <= 100
