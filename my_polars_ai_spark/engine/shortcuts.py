"""Canned-analytics shortcuts mixin (parity with reference
helpers/shortcuts.py:22-376): each method phrases an English prompt and
delegates to ``self.run``. The reference's f-string bug that left
``{window}`` literal in the rolling prompts (helpers/shortcuts.py:310-311,
331-332, 350-351) is fixed here — window sizes interpolate.
"""

from __future__ import annotations


class Shortcuts:
    def clean_data(self, df):
        return self.run(df, "Clean the dataframe: drop duplicate rows and rows with null values, and return it.")

    def impute_missing_values(self, df):
        return self.run(df, "Impute missing values in the dataframe: fill numeric nulls with the column mean, and return it.")

    def generate_features(self, df):
        return self.run(df, "Generate new numeric features from the existing columns and return the dataframe with the new columns added.")

    def plot_pie_chart(self, df, labels: list[str], values: list[str]):
        return self.run(df, f"Plot a pie chart with labels {labels} and values {values} using matplotlib.")

    def plot_bar_chart(self, df, x: list[str], y: list[str]):
        return self.run(df, f"Plot a bar chart with x={x} and y={y} using matplotlib.")

    def plot_histogram(self, df, column: str, bins: int = 10):
        return self.run(df, f"Plot a histogram of column {column} with {bins} bins using matplotlib.")

    def plot_line_chart(self, df, x: str, y: str):
        return self.run(df, f"Plot a line chart with x={x} and y={y} using matplotlib.")

    def plot_scatter_chart(self, df, x: str, y: str):
        return self.run(df, f"Plot a scatter chart with x={x} and y={y} using matplotlib.")

    def plot_correlation_heatmap(self, df):
        return self.run(df, "Plot a correlation heatmap of the numeric columns using matplotlib.")

    def plot_confusion_matrix(self, df, y_true: str, y_pred: str):
        return self.run(df, f"Plot a confusion matrix for true column {y_true} and predicted column {y_pred} using matplotlib.")

    def plot_roc_curve(self, df, y_true: str, y_score: str):
        return self.run(df, f"Plot a ROC curve for true column {y_true} and score column {y_score} using matplotlib.")

    def boxplot(self, df, col: str, by: str | None = None, style: str | None = None):
        grouped = f" grouped by {by}" if by else ""
        styled = f" with style {style}" if style else ""
        return self.run(df, f"Plot a boxplot of column {col}{grouped}{styled} using matplotlib.")

    def rolling_mean(self, df, column: str, window: int):
        return self.run(df, f"Compute the rolling mean of column {column} over a trailing window of {window} rows and return the dataframe with the new column.")

    def rolling_median(self, df, column: str, window: int):
        return self.run(df, f"Compute the rolling median of column {column} over a trailing window of {window} rows and return the dataframe with the new column.")

    def rolling_std(self, df, column: str, window: int):
        return self.run(df, f"Compute the rolling standard deviation of column {column} over a trailing window of {window} rows and return the dataframe with the new column.")

    def segment_customers(self, df, features: list[str], n_clusters: int = 4):
        return self.run(df, f"Segment the rows into {n_clusters} clusters using k-means on features {features} and return the dataframe with a cluster column.")
