from ace_tpu.inference.inference import main

if __name__ == "__main__":
    main()
