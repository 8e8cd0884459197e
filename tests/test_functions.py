"""UDF surface + .str/.dt/series accessors vs pandas oracles
(mirrors reference tests/handyspark/sql/test_string.py, test_datetime.py,
test_pandas.py, test_transform.py strategy)."""
import numpy.testing as npt
import pytest

from handyspark_spark import toHandy


@pytest.fixture(scope="module")
def hpart(tables):
    return toHandy(tables["part"])


@pytest.fixture(scope="module")
def ppart(pdf_tables):
    return pdf_tables["part"]


@pytest.fixture(scope="module")
def horders(tables):
    return toHandy(tables["orders"])


@pytest.fixture(scope="module")
def porders(pdf_tables):
    return pdf_tables["orders"]


def _cmp(hdf, col_expr, pdf_series, n=50):
    hres = hdf.assign(newcol=col_expr).cols["newcol"][:n]
    npt.assert_array_equal(hres.values, pdf_series[:n].values)


# -- .str ----------------------------------------------------------------

def test_str_upper_lower(hpart, ppart):
    s = hpart.pandas["p_name"].str
    _cmp(hpart, s.upper(), ppart["p_name"].str.upper())
    _cmp(hpart, s.lower(), ppart["p_name"].str.lower())


def test_str_len_contains(hpart, ppart):
    s = hpart.pandas["p_name"].str
    _cmp(hpart, s.len(), ppart["p_name"].str.len().astype("int32"))
    _cmp(hpart, s.contains("a", regex=False),
         ppart["p_name"].str.contains("a", regex=False))


def test_str_startswith_endswith(hpart, ppart):
    s = hpart.pandas["p_name"].str
    _cmp(hpart, s.startswith("b"), ppart["p_name"].str.startswith("b"))
    _cmp(hpart, s.endswith("e"), ppart["p_name"].str.endswith("e"))


def test_str_slice_get_pad(hpart, ppart):
    s = hpart.pandas["p_name"].str
    _cmp(hpart, s.slice(0, 5), ppart["p_name"].str.slice(0, 5))
    _cmp(hpart, s.get(2), ppart["p_name"].str.get(2))
    _cmp(hpart, s.pad(30), ppart["p_name"].str.pad(30))
    _cmp(hpart, s.rjust(25, "x"), ppart["p_name"].str.rjust(25, "x"))


def test_str_replace_strip_repeat(hpart, ppart):
    s = hpart.pandas["p_name"].str
    _cmp(hpart, s.replace("a", "X"),
         ppart["p_name"].str.replace("a", "X", regex=False))
    _cmp(hpart, s.strip(), ppart["p_name"].str.strip())
    _cmp(hpart, s.repeat(2), ppart["p_name"].str.repeat(2))


def test_str_count_find_title(hpart, ppart):
    s = hpart.pandas["p_name"].str
    _cmp(hpart, s.count("a"), ppart["p_name"].str.count("a").astype("int32"))
    _cmp(hpart, s.find("re"),
         ppart["p_name"].str.find("re").astype("int32"))
    _cmp(hpart, s.title(), ppart["p_name"].str.title())
    _cmp(hpart, s.capitalize(), ppart["p_name"].str.capitalize())


def test_str_udf_family(hpart, ppart):
    s = hpart.pandas["p_name"].str
    _cmp(hpart, s.isalpha(), ppart["p_name"].str.isalpha())
    _cmp(hpart, s.islower(), ppart["p_name"].str.islower())
    _cmp(hpart, s.zfill(25), ppart["p_name"].str.zfill(25))
    _cmp(hpart, s.center(30), ppart["p_name"].str.center(30))
    _cmp(hpart, s.swapcase(), ppart["p_name"].str.swapcase())


# -- .dt -----------------------------------------------------------------

def test_dt_basic_fields(horders, porders):
    d = horders.pandas["o_orderdate"].dt
    col = porders["o_orderdate"].dt
    _cmp(horders, d.year, col.year.astype("int32"))
    _cmp(horders, d.month, col.month.astype("int32"))
    _cmp(horders, d.day, col.day.astype("int32"))
    _cmp(horders, d.quarter, col.quarter.astype("int32"))
    _cmp(horders, d.dayofweek, col.dayofweek.astype("int32"))
    _cmp(horders, d.dayofyear, col.dayofyear.astype("int32"))
    _cmp(horders, d.daysinmonth, col.daysinmonth.astype("int32"))


def test_dt_booleans(horders, porders):
    d = horders.pandas["o_orderdate"].dt
    col = porders["o_orderdate"].dt
    _cmp(horders, d.is_leap_year, col.is_leap_year)
    _cmp(horders, d.is_month_start, col.is_month_start)
    _cmp(horders, d.is_month_end, col.is_month_end)
    _cmp(horders, d.is_quarter_start, col.is_quarter_start)
    _cmp(horders, d.is_year_start, col.is_year_start)


def test_dt_strftime_and_names(horders, porders):
    d = horders.pandas["o_orderdate"].dt
    col = porders["o_orderdate"].dt
    _cmp(horders, d.strftime("%Y-%m-%d"), col.strftime("%Y-%m-%d"))
    _cmp(horders, d.weekday_name, col.day_name())


def test_dt_weekofyear(horders, porders):
    d = horders.pandas["o_orderdate"].dt
    col = porders["o_orderdate"].dt.isocalendar().week
    _cmp(horders, d.weekofyear, col.astype("int32"))


# -- series methods ------------------------------------------------------

def test_series_between_isin_clip(horders, porders):
    p = horders.pandas["o_totalprice"]
    col = porders["o_totalprice"]
    _cmp(horders, p.between(1000, 50000), col.between(1000, 50000))
    _cmp(horders, p.clip(5000, 100000), col.clip(5000, 100000))
    _cmp(horders, p.abs(), col.abs())
    _cmp(horders, p.round(0), col.round(0))


def test_series_isna_notna(tables, pdf_tables):
    from pyspark.sql import functions as F
    df = tables["lineitem"].withColumn(
        "d", F.when(F.col("l_discount") == 0.0, None)
             .otherwise(F.col("l_discount")))
    hdf = toHandy(df)
    got = hdf.assign(x=hdf.pandas["d"].isna()).cols["x"][:100]
    pl = pdf_tables["lineitem"]["l_discount"][:100]
    npt.assert_array_equal(got.values, (pl == 0.0).values)


# -- transform / apply / assign ------------------------------------------

def test_assign_lambda_infers_type(horders, porders):
    import numpy as np
    got = horders.assign(
        lp=lambda o_totalprice: np.log1p(o_totalprice)).cols["lp"][:50]
    exp = np.log1p(porders["o_totalprice"][:50])
    npt.assert_array_almost_equal(got.values, exp.values)


def test_transform_with_annotation(horders, porders):
    def f(o_totalprice) -> int:
        return (o_totalprice > 10000).astype("int64")

    got = horders.transform(f, name="flag").cols["flag"][:50]
    exp = (porders["o_totalprice"][:50] > 10000).astype("int64")
    npt.assert_array_equal(got.values, exp.values)


def test_apply_projects_only(horders):
    got = horders.apply(lambda o_totalprice: o_totalprice * 2, name="x2")
    assert got.columns == ["x2"]


def test_ret_decorator(horders):
    from handyspark_spark.functions.transform import ret

    @ret("array<double>")
    def f(o_totalprice):
        return o_totalprice.map(lambda v: [v, v * 2])

    out = horders.assign(pair=f)
    assert dict(out.dtypes)["pair"] == "array<double>"


def test_assign_scalar_and_column(horders):
    from pyspark.sql import functions as F
    out = horders.assign(konst=3, doubled=F.col("o_totalprice") * 2)
    row = out.select("konst", "doubled", "o_totalprice").take(1)[0]
    assert row.konst == 3 and row.doubled == 2 * row.o_totalprice


# -- .str edge methods (UDF-backed family) --------------------------------

def test_str_slice_replace_wrap_translate(hpart, ppart):
    s = hpart.pandas["p_name"].str
    _cmp(hpart, s.slice_replace(0, 3, "XX"),
         ppart["p_name"].str.slice_replace(0, 3, "XX"))
    _cmp(hpart, s.wrap(10), ppart["p_name"].str.wrap(10))
    table = str.maketrans({"a": "4", "e": "3"})
    _cmp(hpart, s.translate(table), ppart["p_name"].str.translate(table))
    _cmp(hpart, s.rfind("a"),
         ppart["p_name"].str.rfind("a").astype("int32"))
    _cmp(hpart, s.normalize("NFKD"), ppart["p_name"].str.normalize("NFKD"))


def test_str_match_and_extract(hpart, ppart):
    s = hpart.pandas["p_name"].str
    _cmp(hpart, s.match("b"), ppart["p_name"].str.match("b"))
    _cmp(hpart, s.extract("([a-z]+)"),
         ppart["p_name"].str.extract(r"([a-z]+)", expand=False).fillna(""))


def test_str_remove_accents(spark):
    import pandas as pd

    from handyspark_spark import toHandy
    df = spark.createDataFrame(
        pd.DataFrame({"s": ["café", "naïve", "plain", "Ärger"]}))
    hdf = toHandy(df)
    got = hdf.assign(x=hdf.pandas["s"].str.remove_accents()) \
        .cols["x"][:4].tolist()
    assert got == ["cafe", "naive", "plain", "Arger"]


def test_dt_ceil_round_udf_paths(horders, porders):
    d = horders.pandas["o_orderdate"].dt
    col = porders["o_orderdate"].dt
    _cmp(horders, d.ceil("D"), col.ceil("D"))
    _cmp(horders, d.round("D"), col.round("D"))
    _cmp(horders, d.strftime("%d/%m/%Y %H:%M"),
         col.strftime("%d/%m/%Y %H:%M"))


def test_handy_exception_wraps_collect_failures(tables):
    import pytest as _pytest

    from handyspark_spark import toHandy
    from handyspark_spark.core.util import HandyException

    def boom(o_totalprice):
        raise ValueError("deliberate failure inside the UDF")

    hdf = toHandy(tables["orders"]).assign(bad=boom)
    with _pytest.raises(HandyException) as exc:
        hdf.collect()
    # root cause surfaced in the summary line, not buried in the JVM trace
    assert "deliberate failure" in str(exc.value)


def test_between_time_native(spark):
    import pandas as pd

    from handyspark_spark import toHandy
    ts = pd.date_range("2024-01-01", periods=48, freq="30min")
    pdf = pd.DataFrame({"t": ts, "i": range(48)})
    hdf = toHandy(spark.createDataFrame(pdf))
    got = (hdf.assign(x=hdf.pandas["t"].between_time("09:00", "16:30"))
           .orderBy("i").cols["x"][:48])
    exp = pd.Series(ts, index=ts).between_time("09:00", "16:30")
    exp_mask = pd.Series(ts).isin(exp.values)
    import numpy.testing as npt
    npt.assert_array_equal(got.values, exp_mask.values)
    # overnight wrap-around
    got2 = (hdf.assign(x=hdf.pandas["t"].between_time("22:00", "02:00"))
            .orderBy("i").cols["x"][:48])
    exp2 = pd.Series(ts).isin(
        pd.Series(ts, index=ts).between_time("22:00", "02:00").values)
    npt.assert_array_equal(got2.values, exp2.values)


def test_min_spark_version_guard():
    """The floor is asserted once at import with a clear message."""
    import handyspark_spark as hs
    assert hs.MIN_SPARK == (3, 5)
    import pyspark
    ver = tuple(int(p) for p in pyspark.__version__.split(".")[:2])
    assert ver >= hs.MIN_SPARK
    # the guard itself raises on a pretend-old version
    import unittest.mock as mock
    with mock.patch.object(pyspark, "__version__", "3.4.1"):
        try:
            hs._check_spark_version()
        except ImportError as e:
            assert "3.5" in str(e)
        else:
            raise AssertionError("expected ImportError on pyspark 3.4")
