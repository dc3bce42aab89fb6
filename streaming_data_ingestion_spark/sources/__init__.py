"""Source connectors.

The reference's topology is REST → Kafka → Spark
(/root/reference/dags/kafka-streamer.py, /root/reference/spark-streaming.py:150-155).
Here each leg is a Spark-native source behind one interface:

- ``json_stream``  — file-based JSON-lines stream (the broker-free test
  stand-in for Kafka; identical decode path)
- ``kafka``        — real Kafka reader/writer builders (config only; needs
  a broker + the kafka-sql package on the classpath)
- ``http_source``  — PySpark 4 custom DataSource for REST polling, with a
  deterministic offline generator for tests
"""
