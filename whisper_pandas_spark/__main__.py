from whisper_pandas_spark.cli import main

main()
