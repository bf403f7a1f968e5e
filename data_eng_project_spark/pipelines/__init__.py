"""Reference-parity end-to-end pipelines: the reference's entire
Airflow DAG re-expressed as two lazy DataFrame programs."""
