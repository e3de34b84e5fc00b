"""Sample country/GDP data for the dataframe examples (same public GDP
figures as reference examples/data/sample_dataframe.py:3-29, so the
golden outputs carry over: sum of North American GDPs = US + Canada =
20901884461056)."""

dataframe = {
    "country": [
        "United States", "United Kingdom", "France", "Germany", "Italy",
        "Spain", "Canada", "Australia", "Japan", "China",
    ],
    "gdp": [
        19294482071552, 2891615567872, 2411255037952, 3435817336832,
        1745433788416, 1181205135360, 1607402389504, 1490967855104,
        4380756541440, 14631844184064,
    ],
    "happiness_index": [6.94, 7.16, 6.66, 7.07, 6.38, 6.4, 7.23, 7.22, 5.87, 5.12],
}
