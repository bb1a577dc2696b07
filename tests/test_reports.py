from etl_database_spark.reports import ReportConfig, process_reports, render_report


def _cfg(**kw):
    defaults = dict(
        report_id=1,
        report_name="daily",
        subject="Daily Report",
        recipients=["a@example.com"],
        body_template="<h1>R</h1>{{grid}}",
        body_queries={"grid": "SELECT * FROM t ORDER BY id"},
        attachment_queries=[{"name": "data", "query": "SELECT * FROM t"}],
    )
    defaults.update(kw)
    return ReportConfig(**defaults)


def test_render_report(spark):
    spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string").createOrReplaceTempView("t")
    out = render_report(spark, _cfg())
    assert "<table" in out.html_body and "{{grid}}" not in out.html_body
    assert "x" in out.html_body and "y" in out.html_body
    assert "data.csv" in out.attachments
    assert out.attachments["data.csv"].startswith("id,v")
    assert not out.errors


def test_error_isolation(spark):
    """A failing query renders as error text, never crashes the report
    (send_reports.py:118-121)."""
    spark.createDataFrame([(1,)], "id int").createOrReplaceTempView("t")
    cfg = _cfg(
        body_queries={"grid": "SELECT * FROM missing_table"},
        attachment_queries=[{"name": "bad", "query": "SELECT broken syntax !!"}],
    )
    out = render_report(spark, cfg)
    assert "Error in query 'grid'" in out.html_body
    assert "grid" in out.errors and "bad" in out.errors
    assert out.attachments == {}


def test_process_reports_filters_and_sends(spark):
    spark.createDataFrame([(1,)], "id int").createOrReplaceTempView("t")
    sent = []
    configs = [
        _cfg(report_id=1),
        _cfg(report_id=2, is_active=False),
    ]
    out = process_reports(spark, configs, send=sent.append)
    assert [r.report_id for r in out] == [1]
    assert len(sent) == 1
    out2 = process_reports(spark, configs, report_id=2)
    assert [r.report_id for r in out2] == [2]
