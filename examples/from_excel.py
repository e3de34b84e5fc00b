"""Mirror of reference examples/from_excel.py: same loans question over an
.xlsx ingest -> 247. Works without openpyxl: from_excel falls back to the
stdlib OOXML reader (my_polars_ai_spark/sources/xlsx.py)."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data.loans import write_xlsx

from my_polars_ai_spark import SparkAI, get_spark
from my_polars_ai_spark.engine.llm import FakeLLM
from my_polars_ai_spark.sources.readers import from_excel

spark = get_spark("example_from_excel")
xlsx_path = write_xlsx(os.path.join(tempfile.gettempdir(), "loan_payments.xlsx"))
df = from_excel(spark, xlsx_path)

llm = FakeLLM(
    output="<startCode>\n"
    "df.filter((F.col('Gender') == 'male') & (F.col('loan_status') == 'PAIDOFF')).count()\n"
    "<endCode>"
)
ai = SparkAI(llm=llm, enable_cache=False)
answer = ai.run(df, "How many loans are from men and have been paid off?")
print(answer)
# Output: 247
assert answer == 247
