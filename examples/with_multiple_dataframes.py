"""Mirror of the reference's multi-dataframe example
(reference examples/with_multiple_dataframes.py): "Who gets paid the
most?" over employees + salaries -> Olivia.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from my_polars_ai_spark import SparkAI, get_spark
from my_polars_ai_spark.engine.llm import FakeLLM
from my_polars_ai_spark.sources.readers import from_records

spark = get_spark("example_multi_df")
employees = from_records(
    spark,
    {
        "EmployeeID": [1, 2, 3, 4, 5],
        "Name": ["John", "Emma", "Liam", "Olivia", "William"],
        "Department": ["HR", "Sales", "IT", "Marketing", "Finance"],
    },
)
salaries = from_records(
    spark, {"EmployeeID": [1, 2, 3, 4, 5], "Salary": [5000, 6000, 4500, 7000, 5500]}
)

code = (
    "<startCode>\n"
    "df1.join(df2, 'EmployeeID').orderBy(F.desc('Salary')).limit(1).select('Name').collect()[0][0]\n"
    "<endCode>"
)
ai = SparkAI(llm=FakeLLM(output=code), enable_cache=False)
answer = ai.run([employees, salaries], "Who gets paid the most?")
print(answer)  # Olivia
assert answer == "Olivia"
