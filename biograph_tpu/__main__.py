from biograph_tpu.cli import main

main()
