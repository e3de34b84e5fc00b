"""Mirror of the reference's single-dataframe example
(reference examples/single_dataframe_example.py): "What is the sum of the
A column?" -> 15. Runs offline with FakeLLM standing in for a provider;
swap in CallableLLM(fn) for a real model.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from my_polars_ai_spark import SparkAI, get_spark
from my_polars_ai_spark.engine.llm import FakeLLM
from my_polars_ai_spark.sources.readers import from_records

spark = get_spark("example_single_df")
df = from_records(
    spark,
    {
        "A": [1, 2, 3, 4, 5],
        "fruits": ["banana", "banana", "apple", "apple", "banana"],
        "B": [5, 4, 3, 2, 1],
        "cars": ["beetle", "audi", "beetle", "beetle", "beetle"],
    },
)

llm = FakeLLM(output="<startCode>\ndf.agg(F.sum('A')).collect()[0][0]\n<endCode>")
ai = SparkAI(llm=llm, enable_cache=False)
answer = ai.run(df, "What is the sum of the A column?")
print(answer)  # 15
assert answer == 15
